"""Spatially-partitioned (SP) single-stream inference: exactness of the
row-sharded `infer_sequence_sp` against the unsharded `infer_sequence`.

The SP path decomposes every pipeline stage into overlapped row windows
(clamp-shifted at the global borders) and exchanges HR warp halos with
`ppermute`. The decomposition is mathematically exact — the slab warp and
window slicing are verified bitwise below — but XLA compiles convolutions
at each static window height with its own vectorisation, so conv outputs
can differ from the full-height program by 1 ulp (measured: flow drift
2.4e-7, stable over 7 recurrent frames). The sequence-level bar is
therefore max uint8 diff <= 1 on <= 0.02% of pixels (a value landing
exactly on a .5 rounding boundary), not bit-identity. Geometries exercise
each regime: windows clamped to the whole image (small h), real interior
cropping (l_sr < h), FNet window slicing (l_fn < h), and multi-hop border
halo assembly (b2 > s*v).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tecogan_tpu.models.networks import FRNetConfig, infer_sequence, init_frnet
from tecogan_tpu.models.networks.frnet_sp import infer_sequence_sp
from tecogan_tpu.ops.warp import backward_warp, backward_warp_window
from tecogan_tpu.parallel import get_sp_mesh


def _cfg(nb=2, scale=4, degradation="BD"):
    return FRNetConfig(nf=8, nb=nb, scale=scale, degradation=degradation,
                       compute_dtype="float32")


def _run_pair(rng, k, t, h, w, nb=2, scale=4, chunk=3, degradation="BD"):
    cfg = _cfg(nb=nb, scale=scale, degradation=degradation)
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = jnp.asarray(rng.random((t, h, w, 3)), jnp.float32)
    ref = np.asarray(infer_sequence(params, lr, cfg, chunk=chunk))
    mesh = get_sp_mesh(k)
    got = np.asarray(infer_sequence_sp(params, lr, cfg, mesh, chunk=chunk))
    return ref, got


def _assert_u8_close(got, ref):
    """uint8 equality up to single .5-boundary rounding flips (the 1-ulp
    conv-shape drift documented in the module docstring)."""
    assert got.shape == ref.shape
    d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    frac = np.count_nonzero(d) / d.size
    assert d.max() <= 1 and frac <= 2e-4, (d.max(), frac)


def test_window_warp_matches_full_warp(rng):
    """backward_warp_window on the full image == backward_warp."""
    x = jnp.asarray(rng.random((2, 40, 12, 3)), jnp.float32)
    flow = jnp.asarray((rng.random((2, 40, 12, 2)) - 0.5) * 30, jnp.float32)
    full = backward_warp(x, flow)
    win = backward_warp_window(x, flow, out_y0=0, x_y0=0, h_glob=40)
    np.testing.assert_allclose(np.asarray(win), np.asarray(full),
                               rtol=0, atol=1e-6)


def test_window_warp_slab(rng):
    """A row slab with out-of-image garbage bands reproduces the global
    warp on the rows it is valid for, including border clamping."""
    h, pad = 64, 24
    x = jnp.asarray(rng.random((1, h, 8, 3)), jnp.float32)
    flow = jnp.asarray((rng.random((1, 32, 8, 2)) - 0.5) * 40, jnp.float32)
    out_y0 = 8  # output rows [8, 40)
    full = backward_warp(
        x, jnp.pad(flow, ((0, 0), (out_y0, h - out_y0 - 32), (0, 0),
                          (0, 0))))[:, out_y0:out_y0 + 32]
    # slab = zero bands beyond the image + the real rows (x_y0 = -pad)
    slab = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    win = backward_warp_window(slab, flow, out_y0=out_y0, x_y0=-pad,
                               h_glob=h)
    np.testing.assert_allclose(np.asarray(win), np.asarray(full),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("k,h", [(2, 128), (4, 256)])
def test_sp_matches_unsharded(rng, k, h):
    """Windows clamped to the image (k=2) and real interior crops +
    2-hop border halos (k=4, v=64, b2=360)."""
    ref, got = _run_pair(rng, k=k, t=5, h=h, w=16)
    _assert_u8_close(got, ref)


def test_sp_matches_unsharded_fnet_sliced(rng):
    """h=384, k=4 -> v=96: l_fn = 352 < h, the FNet window is a strict
    slice; also crosses a chunk boundary (t=7, chunk=3)."""
    ref, got = _run_pair(rng, k=4, t=7, h=384, w=8, chunk=3)
    _assert_u8_close(got, ref)


def test_sp_matches_unsharded_2x(rng):
    """scale=2 halo arithmetic (reach 50 -> 56, b2 = 184)."""
    ref, got = _run_pair(rng, k=4, t=4, h=256, w=16, scale=2)
    _assert_u8_close(got, ref)


def test_sp_matches_unsharded_bi(rng):
    """BI degradation: the bicubic half-pixel global residual windows
    (2-LR-row support, well inside the h_sr halo) instead of BD's."""
    ref, got = _run_pair(rng, k=4, t=4, h=256, w=16, degradation="BI")
    _assert_u8_close(got, ref)


def test_sp_mesh_size_one_falls_back(rng):
    cfg = _cfg()
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = jnp.asarray(rng.random((3, 64, 16, 3)), jnp.float32)
    mesh = get_sp_mesh(1)
    got = np.asarray(infer_sequence_sp(params, lr, cfg, mesh, chunk=3))
    ref = np.asarray(infer_sequence(params, lr, cfg, chunk=3))
    np.testing.assert_array_equal(got, ref)


def _model_opt(spatial_partition):
    return {
        "scale": 4, "manual_seed": 0,
        "dataset": {"degradation": {"type": "BD", "sigma": 1.5}},
        "model": {"name": "FRVSR",
                  "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                                "nf": 8, "nb": 2}},
        "test": {"padding_mode": "reflect", "num_pad_front": 2,
                 "spatial_partition": spatial_partition},
    }


def test_model_infer_spatial_partition_flag(rng):
    """`test.spatial_partition: true` routes VSRModel.infer through the
    row-sharded path (largest fitting device count) with matching output;
    an incompatible height falls back to the single-chip path."""
    from tecogan_tpu.models import define_model

    lr = rng.random((5, 64, 16, 3)).astype(np.float32)
    ref = define_model(_model_opt(False)).infer(lr, chunk=3)
    m = define_model(_model_opt(True))
    got = m.infer(lr, chunk=3)
    _assert_u8_close(got, ref)
    assert any(k[0] == "sp" for k in m._infer_fn_cache
               if isinstance(k, tuple))
    # h=8: every k>=2 gives h/k < 8 rows/shard -> no fit, fallback path
    lr_small = rng.random((5, 8, 16, 3)).astype(np.float32)
    m2 = define_model(_model_opt(True))
    ref2 = define_model(_model_opt(False)).infer(lr_small, chunk=3)
    got2 = m2.infer(lr_small, chunk=3)
    _assert_u8_close(got2, ref2)
    assert not any(isinstance(k, tuple) and k[0] == "sp"
                   for k in m2._infer_fn_cache)


def test_sp_rejects_misaligned_rows(rng):
    cfg = _cfg()
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    mesh = get_sp_mesh(4)
    lr = jnp.zeros((3, 120, 16, 3), jnp.float32)  # 120/4 = 30, not /8
    with pytest.raises(ValueError, match="multiple of 8"):
        infer_sequence_sp(params, lr, cfg, mesh)
    lr = jnp.zeros((3, 130, 16, 3), jnp.float32)  # not divisible by 4
    with pytest.raises(ValueError, match="not divisible"):
        infer_sequence_sp(params, lr, cfg, mesh)
