"""Entry driver: train / test / profile (reference contract: `codes/main.py`).

Single-controller JAX replaces torch.distributed.launch: one process drives
the whole mesh; batches are global and sharded over devices. The train loop,
validation sub-loop, logging cadence, checkpoint cadence and result layout
mirror the reference so existing experiment YAMLs and tooling work.
"""

from __future__ import annotations

import math
import os.path as osp
import time

import numpy as np

from .data import create_dataloader, create_test_dataset
from .metrics import create_metric_calculator, profile_frnet
from .models import define_model
from .ops import save_sequence
from .utils import config as config_utils
from .utils import paths as path_utils
from .utils.logging_utils import log_info, print_options, setup_logger


def _run_test_sets(opt, model, model_idx):
    """Shared by test mode and in-training validation.

    In multi-host runs, sequences are round-robined over processes (the
    reference round-robins over ranks, `main.py:93,169`) and per-sequence
    metric averages are allgathered before saving.
    """
    import jax

    rank, world = jax.process_index(), jax.process_count()

    for dataset_idx in sorted(opt["dataset"].keys()):
        if "test" not in dataset_idx:
            continue
        ds_name = opt["dataset"][dataset_idx]["name"]
        log_info(f"Testing on {ds_name} dataset")

        # cache per dataset on the model: in-training validation calls this
        # every test_freq iters, and rebuilding the dataset + metric stack
        # (incl. LPIPS weight loads) each round is pure wasted I/O
        cache = getattr(model, "_test_set_cache", None)
        if cache is None:
            cache = model._test_set_cache = {}
        if dataset_idx not in cache:
            cache[dataset_idx] = (create_test_dataset(opt, dataset_idx),
                                  create_metric_calculator(opt))
        test_dataset, metric_calculator = cache[dataset_idx]
        if metric_calculator is not None:
            metric_calculator.reset()

        for idx in range(rank, len(test_dataset), world):
            data = test_dataset[idx]
            lr_data = model.prepare_inference_data(data)
            hr_seq = model.infer(lr_data)

            if opt["test"]["save_res"]:
                res_dir = osp.join(opt["test"]["res_dir"], ds_name, model_idx)
                save_sequence(
                    osp.join(res_dir, data["seq_idx"]), hr_seq,
                    data["frm_idx"], to_bgr=True)

            if metric_calculator is not None:
                metric_calculator.compute_sequence_metrics(
                    data["seq_idx"], np.asarray(data["gt"]), hr_seq)

        if metric_calculator is not None:
            metric_calculator.gather(list(metric_calculator.metric_dict))
            if world > 1:
                _allgather_metrics(metric_calculator)
            if rank != 0:
                continue
            if opt["test"].get("save_json"):
                json_path = osp.join(
                    opt["test"]["json_dir"], f"{ds_name}_avg.json")
                metric_calculator.save(model_idx, json_path, override=True)
            else:
                metric_calculator.display()


def _allgather_metrics(metric_calculator):
    """Merge per-sequence metric averages across hosts.

    Two-phase: payload SIZES are allgathered first so every host pads to
    the true global maximum — a fixed pad cap would make the second
    allgather shape-mismatch (and crash after all inference work) the
    moment one host's metric dict outgrows it."""
    import json as _json

    from jax.experimental import multihost_utils

    payload = _json.dumps(metric_calculator.avg_metric_dict).encode()
    sizes = multihost_utils.process_allgather(
        np.asarray([len(payload)], np.int64))
    cap = int(np.max(sizes))
    gathered = multihost_utils.process_allgather(
        np.frombuffer(payload.ljust(cap), dtype=np.uint8))
    merged = {}
    for row in np.atleast_2d(gathered):
        merged.update(_json.loads(bytes(row).decode().rstrip()))
    metric_calculator.avg_metric_dict = dict(sorted(merged.items()))


def train(opt):
    import jax

    log_info(f'{20 * "-"} Configurations {20 * "-"}')
    print_options(opt)

    model = define_model(opt)
    n_dev = model.mesh.devices.size
    train_loader = create_dataloader(opt, "train", "train", n_devices=n_dev,
                                     mesh=model.mesh)

    total_sample = len(train_loader.dataset)
    iter_per_epoch = len(train_loader)
    total_iter = opt["train"]["total_iter"]
    total_epoch = int(math.ceil(total_iter / iter_per_epoch))
    start_iter = opt["train"].get("start_iter", 0)
    test_freq = opt["test"]["test_freq"]
    log_freq = opt["logger"]["log_freq"]
    ckpt_freq = opt["logger"]["ckpt_freq"]

    log_info(f"Number of the training samples: {total_sample}")
    log_info(f"{total_epoch} epochs needed for {total_iter} iterations")

    # auto-resume if a state checkpoint exists
    model.state, resumed = model.try_resume(model.state)
    if resumed:
        start_iter = int(np.asarray(model.state["step"]))

    # Resume continues the DATA STREAM where the checkpoint left off, not
    # just the step counter: the loaders seed shuffling and per-sample
    # crops by (seed, epoch, i), so restarting at epoch 0 would replay
    # exactly the samples already consumed (and a run resumed near the
    # end would never see the later-epoch shuffles). Enter at the
    # checkpoint's epoch and skip the batches it already trained on.
    start_epoch = start_iter // iter_per_epoch
    skip_in_epoch = start_iter % iter_per_epoch

    it = 0
    curr_iter = start_iter
    try:
        for epoch in range(start_epoch, total_epoch):
            # start_batch skips consumed batches WITHOUT assembling them
            # (a checkpoint late in a long epoch would otherwise decode +
            # augment thousands of discarded batches before step one);
            # determinism is identical — sample streams are keyed by
            # (seed, epoch, dataset index), not batch position
            epoch_iter = train_loader.epoch(
                epoch,
                start_batch=skip_in_epoch if epoch == start_epoch else 0)
            for batch in epoch_iter:
                it += 1
                curr_iter = start_iter + it
                # total_iter is the GLOBAL budget: a resumed run (auto-
                # resume sets start_iter to the checkpoint step) finishes
                # the remaining iterations instead of training total_iter
                # more
                if curr_iter > total_iter:
                    return

                batch = model.prepare_training_data(batch)
                model.train(batch)

                if log_freq > 0 and curr_iter % log_freq == 0:
                    log_info(model.get_format_msg(model.state, epoch,
                                                  curr_iter))

                if (ckpt_freq > 0
                        and (curr_iter == total_iter
                             or curr_iter % ckpt_freq == 0)
                        and jax.process_index() == 0):
                    # always checkpoint the final iteration even when
                    # ckpt_freq does not divide total_iter — downstream
                    # eval expects G_iter{total_iter} to exist.
                    # ckpt_freq: 0 keeps its meaning of 'no checkpoints
                    # at all' (scratch/bench runs rely on it)
                    # rank 0 only (reference @master_only): concurrent
                    # writers on a shared filesystem would race on the
                    # same checkpoint path
                    model.save(curr_iter)
                    model.save_training_state(model.state, curr_iter)

                if test_freq > 0 and curr_iter % test_freq == 0:
                    _run_test_sets(opt, model, f"G_iter{curr_iter}")
    except BaseException:
        # crash/preemption safety the reference lacks: persist the full
        # training state so auto-resume continues from here (rank 0 only —
        # concurrent writers would race on the shared path). When the
        # jitted step ITSELF crashed, the state buffers were donated to it
        # (donate_argnums) and are already deleted — an emergency save is
        # impossible for that class; say so loudly instead of silently
        # swallowing the save failure and letting the operator believe a
        # checkpoint exists.
        try:
            if jax.process_index() == 0:
                donated = any(
                    getattr(x, "is_deleted", lambda: False)()
                    for x in jax.tree.leaves(model.state))
                if donated:
                    log_info(
                        "Emergency save impossible: the training-state "
                        "buffers were donated to the failed step — resume "
                        "from the last periodic checkpoint")
                else:
                    model.save_training_state(model.state, curr_iter)
                    log_info(f"Emergency training state saved at iter "
                             f"{curr_iter}")
        except Exception as e:
            log_info(f"Emergency training-state save failed: {e!r}")
        raise


def test(opt):
    print_options(opt)
    model = None
    for load_path in opt["model"]["generator"]["load_path_lst"]:
        model_idx = osp.splitext(osp.split(load_path)[-1])[0]
        log_info("=" * 40)
        log_info(f"Testing model: {model_idx}")
        log_info("=" * 40)

        if model is None:
            opt["model"]["generator"]["load_path"] = load_path
            model = define_model(opt)
        else:
            # sweep over checkpoints: swap params only — datasets, metric
            # stack and compiled inference executables are reused
            model.load_generator(load_path)
        _run_test_sets(opt, model, model_idx)
        log_info("-" * 40)


def profile(opt, lr_size: str, test_speed: bool = False):
    import jax
    import jax.numpy as jnp

    from .models.networks import define_generator, step

    print_options(opt["model"]["generator"])
    c, h, w = map(int, lr_size.split("x"))
    scale = opt["scale"]
    msg = "\n" + "*" * 40
    msg += (f"\nResolution: {lr_size} -> "
            f"{c}x{h * scale}x{w * scale} ({scale}x SR)")

    cfg, init_fn = define_generator(opt)
    params = init_fn(jax.random.PRNGKey(0))

    gflops, params_cnt = profile_frnet(cfg, (c, h, w))
    tot_g, tot_p = 0.0, 0
    for name in gflops:
        msg += f'\n{"-" * 40}\nModule: [{name}]'
        msg += f"\n    FLOPs (10^9): {gflops[name]:.3f}"
        msg += f"\n    Parameters (10^6): {params_cnt[name] / 1e6:.3f}"
        tot_g += gflops[name]
        tot_p += params_cnt[name]
    msg += f'\n{"-" * 40}\nOverall'
    msg += f"\n    FLOPs (10^9): {tot_g:.3f}"
    msg += f"\n    Parameters (10^6): {tot_p / 1e6:.3f}"

    import functools

    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    lr_curr = jax.random.uniform(k1, (1, h, w, c), jnp.float32)
    lr_prev = jax.random.uniform(k2, (1, h, w, c), jnp.float32)
    hr_prev = jax.random.uniform(
        k3, (1, scale * h, scale * w, c), jnp.float32)

    # XLA's own cost analysis of the jitted step (compiler ground truth)
    from .metrics import xla_cost

    cost = xla_cost(functools.partial(step, cfg=cfg), params, lr_curr,
                    lr_prev, hr_prev)
    if cost and cost.get("flops") == cost.get("flops"):  # not NaN
        msg += (f"\n    XLA cost analysis: {cost['flops'] / 1e9:.3f} GFLOPs, "
                f"{cost['bytes_accessed'] / 1e9:.3f} GB accessed")
    msg += "\n" + "*" * 40

    if test_speed:
        step_fn = jax.jit(functools.partial(step, cfg=cfg))
        # warmup / compile
        step_fn(params, lr_curr, lr_prev, hr_prev).block_until_ready()

        import contextlib
        import os as _os

        # optional timeline capture for xprof/tensorboard
        trace_dir = _os.environ.get("TECOGAN_TRACE_DIR")
        trace_cm = (jax.profiler.trace(trace_dir) if trace_dir
                    else contextlib.nullcontext())

        n_test = 30
        with trace_cm:
            t0 = time.time()
            for _ in range(n_test):
                out = step_fn(params, lr_curr, lr_prev, hr_prev)
            out.block_until_ready()
            dt = time.time() - t0
        msg += (f"\nSpeed: {n_test / dt:.3f} FPS "
                f"(averaged over {n_test} runs)\n" + "*" * 40)

    log_info(msg)


def main(argv=None):
    # multi-host rendezvous FIRST — before any jax backend query
    # (reference analogue: init_dist at launch, base_utils.py:51-75)
    from .parallel import maybe_init_distributed

    maybe_init_distributed()

    try:  # persistent XLA compilation cache (first compiles take minutes)
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          osp.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    args = config_utils.parse_args(argv)
    opt = config_utils.parse_configs(args)
    setup_logger("base")
    path_utils.setup_paths(opt, args.mode)

    if args.mode == "train":
        train(opt)
    elif args.mode == "test":
        test(opt)
    elif args.mode == "profile":
        profile(opt, args.lr_size, args.test_speed)
    else:
        raise ValueError(
            f"Unrecognized mode: {args.mode} (train|test|profile)")


if __name__ == "__main__":
    main()
