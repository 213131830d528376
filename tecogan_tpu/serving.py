"""AOT export/load of the streaming-inference step for serving.

`jax.export` serializes the lowered StableHLO of the jitted streaming
step; a serving process deserializes and calls it without retracing
Python and without needing tecogan_tpu model code beyond this module.
XLA still compiles the artifact once at first call on the serving host
(including its autotuning) — a persistent compilation cache covers
repeat cold-starts; what the artifact removes is the Python/tracing
layer and the model-code dependency, and it pins the traced program
(kernel choices, dtypes, geometry) exactly.

The reference has no deployment story beyond re-running its test
entrypoint (`/root/reference/codes/main.py:71-104` reloads + re-builds
the torch graph per process); this is a TPU-native addition.

Artifacts are exported for explicit platforms (default: the current
backend) at a FIXED geometry (t, h, w) — serving deployments have a
known camera/stream geometry, and static shapes are what let XLA pick
the fast packed kernels. Export one artifact per geometry.
"""

from __future__ import annotations

import dataclasses
import io

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .models.networks import FRNetConfig, infer_sequence_batch

__all__ = ["export_stream", "load_stream", "save_artifact",
           "load_artifact"]

_MAGIC = b"TECOSRV1"


def _stream_fn(cfg: FRNetConfig, chunk: int):
    def run(params, lr_seqs):
        return infer_sequence_batch(params, lr_seqs, cfg, chunk)
    return run


def export_stream(params, cfg: FRNetConfig, n: int, t: int, h: int, w: int,
                  chunk: int = 16, platforms=None) -> bytes:
    """Serialize the jitted streaming step for ``n`` concurrent streams of
    ``t`` frames at LR (h, w); returns the artifact bytes.

    ``params`` fixes only the pytree STRUCTURE and dtypes — the serving
    process passes its own weights at call time (same tree).

    ``platforms``: target platform(s) for the artifact (default: the
    exporting host's backend). The target platform is threaded into the
    generator's trace-time kernel dispatch (``FRNetConfig.platform``), so
    exporting FROM a CPU box FOR TPU bakes the fast Pallas warp path, and
    exporting for CPU never embeds Mosaic TPU custom calls the serving
    host could not compile.
    """
    if platforms is not None:
        plats = tuple(str(p).lower() for p in platforms)
        if not plats:
            raise ValueError(
                "platforms must name at least one target platform "
                "(e.g. ['tpu']) or be None for the exporting host's "
                "backend")
        if len(set(plats)) > 1:
            # one artifact per platform: kernel dispatch (Pallas warp vs
            # XLA gather, s2d folding) differs per platform, and a single
            # traced program cannot carry both
            raise ValueError(
                f"export_stream targets exactly one platform per artifact "
                f"(got {plats}); export separately per platform")
        cfg = dataclasses.replace(cfg, platform=plats[0])
    fn = jax.jit(_stream_fn(cfg, chunk))
    lr_spec = jax.ShapeDtypeStruct((n, t, h, w, 3), jnp.float32)
    p_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        params)
    kw = {}
    if platforms is not None:
        # the lowered tuple — jax.export matches platform names
        # case-sensitively, so passing the raw user strings (e.g. "TPU")
        # would fail inside lowering with a confusing internal error
        kw["platforms"] = plats
    exp = jax_export.export(fn, **kw)(p_spec, lr_spec)
    return exp.serialize()


def load_stream(blob: bytes):
    """Deserialize an ``export_stream`` artifact -> callable
    ``(params, lr_seqs) -> uint8 (n, t, sh, sw, 3)`` (jit-wrapped, so the
    underlying executable is compiled once and cached)."""
    exp = jax_export.deserialize(blob)
    return jax.jit(exp.call)


_PARAMS_NS = "params/"


def save_artifact(path: str, blob: bytes, meta: dict | None = None,
                  params=None) -> None:
    """Write the artifact with a small npz sidecar header (geometry +
    config echo) so a serving host can validate inputs before calling.

    ``params``: optionally embed the generator weights, making the file a
    self-contained serving bundle (``python -m tecogan_tpu.serve`` runs
    straight from it). The weights must be the same pytree passed to
    ``export_stream`` — the traced program pins their structure/dtypes.
    Omit to ship a weights-free artifact whose host supplies a checkpoint.
    """
    from .utils import ckpt as ckpt_io

    extra = {}
    if params is not None:
        extra = ckpt_io._flatten(jax.device_get(params), _PARAMS_NS)
    buf = io.BytesIO()
    np.savez(buf, blob=np.frombuffer(blob, np.uint8),
             meta=np.asarray(repr(meta or {})), **extra)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(buf.getvalue())


def load_artifact(path: str):
    """Read a ``save_artifact`` file -> (callable, meta dict, params).

    ``params`` is the embedded weight pytree, or None for a weights-free
    artifact (the caller then supplies its own checkpoint, same tree)."""
    from .utils import ckpt as ckpt_io

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(
                f"{path} is not a tecogan serving artifact (bad magic "
                f"{magic!r})")
        data = f.read()
    z = np.load(io.BytesIO(data), allow_pickle=False)
    import ast
    meta = ast.literal_eval(str(z["meta"]))
    flat = {k[len(_PARAMS_NS):]: z[k] for k in z.files
            if k.startswith(_PARAMS_NS)}
    params = ckpt_io._unflatten(flat) if flat else None
    return load_stream(z["blob"].tobytes()), meta, params
