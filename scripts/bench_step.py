"""Quick single-model train-step timing (pipelined protocol).

Usage: python scripts/bench_step.py [frvsr|tecogan] [--fp32]
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from bench_suite import _train_iter

    model = sys.argv[1] if len(sys.argv) > 1 else "tecogan"
    mixed = "--fp32" not in sys.argv
    unroll = None
    for a in sys.argv[2:]:
        if a.startswith("--unroll="):
            v = a.split("=")[1]
            unroll = True if v == "full" else int(v)
    t = _train_iter(model, mixed_precision=mixed, train_unroll=unroll)
    print(f"{model} {'bf16' if mixed else 'fp32'} unroll={unroll}: "
          f"{t * 1000:.1f} ms/iter")


if __name__ == "__main__":
    main()
