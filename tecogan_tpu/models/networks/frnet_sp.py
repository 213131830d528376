"""Spatially-partitioned (SP) streaming inference — one video stream's
rows sharded over a TPU mesh.

Reference scope: the reference serves one stream per GPU (`codes/main.py:
248-262`); it has no way to bring several accelerators to bear on a single
high-resolution stream. This module adds that TPU-natively: the frame's
ROW axis is sharded over a 1-D ``('sp',)`` mesh inside ``shard_map``, the
recurrent HR state stays resident and sharded in HBM, and the only
communication is (a) an all-gather of the tiny LR chunk and (b) a
per-frame ``ppermute`` halo exchange of HR boundary bands over ICI.
Use case: single-stream latency on large frames (e.g. realtime 4K/8K SR),
where batching more streams onto one chip cannot help.

Decomposition (overlap-and-discard, exact by construction):

- Every shard computes an extended row WINDOW of each pipeline stage and
  discards the contaminated margin. Windows are clamp-shifted at the
  global top/bottom so border shards start exactly at the true image
  border — each conv then applies its own zero padding there, which makes
  the sharded computation mathematically identical to the unsharded one
  (a plain zero-filled halo would let bias terms cascade where the
  reference re-pads zeros at every layer). In float it agrees to 1 ulp:
  XLA compiles each window height with its own conv vectorisation, so
  reduction order — not the decomposition — is the only difference
  (tests pin uint8 output to <=1 gray-level on <=0.02% of pixels).
- FNet needs a wide receptive field (~60 LR rows), so its window carries
  ``H_FN = H_SR + 96`` halo rows; the LR frame is cheap, so windows are
  sliced from an all-gathered LR chunk rather than halo-exchanged.
- The SR step (conv_in + 2·nb resblock convs + upsample tail + bicubic
  residual) contaminates ~``2·nb + 8`` rows; its window carries ``H_SR``
  halo rows.
- The flow-guided warp reads the previous HR frame at most
  ``24·scale + 1`` rows away (FNet's tanh velocity bound), so each shard
  assembles a warp slab from its own HR rows plus ``ppermute``d neighbor
  bands, and samples it with coordinates clamped at the GLOBAL image
  border (`ops.warp.backward_warp_window`). Border windows are shifted,
  so their slab reach exceeds one neighbor — the exchange sends whole
  blocks from up to ``hops`` neighbors each way.

Constraints: ``h % k == 0`` and ``(h / k) % 8 == 0`` (FNet's pooling
alignment; also keeps every dynamic window start a multiple of 8).
Agreement with `infer_sequence` is pinned by tests/test_sp_inference.py
on virtual CPU meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ... import nn
from ...ops.warp import backward_warp_window
from .fnet import _MAX_VELOCITY, fnet_apply
from .frnet import FRNetConfig, _hr_flow, _sr_step, infer_sequence

__all__ = ["infer_sequence_sp"]


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def infer_sequence_sp(params, lr_seq: jnp.ndarray, cfg: FRNetConfig,
                      mesh: Mesh, chunk: int = 8) -> jnp.ndarray:
    """SR one LR sequence with rows sharded over ``mesh``'s ``'sp'`` axis.

    Args:
        params: {'fnet', 'srnet'} pytree (replicated).
        lr_seq: (t, h, w, c) LR frames in [0, 1]; ``h`` must satisfy
            ``h % (8 * k) == 0`` for a k-shard mesh.
        mesh: 1-D mesh with axis ``'sp'``.
        chunk: frames per inner scan (FNet batch size).

    Returns uint8 (t, s*h, s*w, c), sharded over rows — matches
    ``infer_sequence`` output to <=1 gray-level (1-ulp conv-shape drift;
    see module docstring).
    """
    k = mesh.shape["sp"]
    if k == 1:
        return infer_sequence(params, lr_seq, cfg, chunk=chunk)

    t, h, w, c = lr_seq.shape
    s = cfg.scale
    if h % k:
        raise ValueError(f"rows h={h} not divisible by sp mesh size {k}")
    v = h // k
    if v % 8:
        raise ValueError(
            f"rows-per-shard h/k={v} must be a multiple of 8 (FNet "
            "pooling alignment); pad the input or use fewer shards")

    # halo accounting (LR rows): SR-step conv/resize contamination, FNet
    # receptive field on top of it, and the warp's HR sample reach
    h_sr = _round8(max(32, 2 * cfg.nb + 12))
    h_fn = h_sr + 96
    reach = _round8(int(_MAX_VELOCITY * s) + 2)       # 97 -> 104 at 4x
    b2 = _round8(2 * s * h_sr + reach)                # border-window reach
    hops = -(-b2 // (s * v))

    l_fn = min(h, v + 2 * h_fn)
    l_sr = min(h, v + 2 * h_sr)

    dt = jnp.dtype(cfg.compute_dtype)
    if dt != lr_seq.dtype:
        params = nn.cast_params(params, dt)
        lr_seq = lr_seq.astype(dt)

    # chunk balancing, as in infer_sequence_batch
    n_chunks = -(-t // chunk)
    chunk = -(-t // n_chunks)
    pad = n_chunks * chunk - t
    if pad:
        lr_seq = jnp.concatenate(
            [lr_seq, jnp.broadcast_to(lr_seq[-1:], (pad, h, w, c))], axis=0)

    def body(lr_local, prm):
        # lr_local: (t_pad, v, w, c) — this shard's rows
        i = jax.lax.axis_index("sp")
        row0 = i * v
        fn_start = jnp.clip(row0 - h_fn, 0, h - l_fn)
        sr_start = jnp.clip(row0 - h_sr, 0, h - l_sr)

        def exchange(hr):  # (1, s*v, s*w, c) -> slab covering +-b2 rows
            parts = []
            for d in range(hops, 0, -1):
                parts.append(jax.lax.ppermute(
                    hr, "sp", [(j, j + d) for j in range(k - d)]))
            parts.append(hr)
            for d in range(1, hops + 1):
                parts.append(jax.lax.ppermute(
                    hr, "sp", [(j, j - d) for j in range(d, k)]))
            slab = jnp.concatenate(parts, axis=1)
            off = hops * s * v - b2
            return jax.lax.slice_in_dim(slab, off, off + s * v + 2 * b2,
                                        axis=1)

        def outer(carry, lr_chunk_local):
            lr_prev_full, hr_prev = carry
            chunk_full = jax.lax.all_gather(
                lr_chunk_local, "sp", axis=1, tiled=True)  # (chunk,h,w,c)
            prevs = jnp.concatenate([lr_prev_full[None], chunk_full[:-1]],
                                    axis=0)
            sl = lambda x, st, ln: jax.lax.dynamic_slice(  # noqa: E731
                x, (0, st, 0, 0), (chunk, ln) + x.shape[2:])
            lr_flow = fnet_apply(prm["fnet"], sl(chunk_full, fn_start, l_fn),
                                 sl(prevs, fn_start, l_fn))
            flow_sr = jax.lax.dynamic_slice(
                lr_flow, (0, sr_start - fn_start, 0, 0),
                (chunk, l_sr) + lr_flow.shape[2:])
            hr_flow = _hr_flow(cfg, flow_sr, l_sr, w)
            lr_sr = sl(chunk_full, sr_start, l_sr)

            warp_fn = functools.partial(
                backward_warp_window, out_y0=s * sr_start,
                x_y0=s * row0 - b2, h_glob=s * h)

            def inner(hr_c, inp):
                lr_i, flow_i = inp
                slab = exchange(hr_c)
                hr_ext = _sr_step(cfg, prm["srnet"], lr_i[None], slab,
                                  flow_i[None], warp_fn=warp_fn)
                hr_new = jax.lax.dynamic_slice(
                    hr_ext, (0, s * (row0 - sr_start), 0, 0),
                    (1, s * v, s * w, cfg.out_nc))
                return hr_new, hr_new

            hr_last, hr_seq = jax.lax.scan(inner, hr_prev,
                                           (lr_sr, hr_flow))
            out = jnp.clip(
                jnp.round(hr_seq[:, 0].astype(jnp.float32) * 255.0),
                0, 255).astype(jnp.uint8)
            return (chunk_full[-1], hr_last), out

        # the zero initial state is produced on every shard, so mark it
        # device-varying: scan requires the carry type to match the
        # sharded outputs ({V:sp})
        carry0 = jax.lax.pcast(
            (jnp.zeros((h, w, c), dt),
             jnp.zeros((1, s * v, s * w, cfg.out_nc), dt)),
            ("sp",), to="varying")
        lr_chunks = lr_local.reshape(n_chunks, chunk, v, w, c)
        _, out = jax.lax.scan(outer, carry0, lr_chunks)
        return out.reshape(n_chunks * chunk, s * v, s * w, cfg.out_nc)

    prm_specs = jax.tree.map(lambda _: P(), params)
    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, "sp", None, None), prm_specs),
        out_specs=P(None, "sp", None, None))(lr_seq, params)
    return out[:t]
