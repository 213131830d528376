"""GAN-step variants: SNet discriminator, BI degradation, feature matching."""

import functools

import numpy as np
import pytest

import jax

from tecogan_tpu.models.networks import (
    FRNetConfig, SNetConfig, init_frnet, init_snet, init_vgg19)
from tecogan_tpu.models.schedules import make_adam
from tecogan_tpu.models.steps import (
    TrainConfig, tecogan_init_state, tecogan_train_step)
from tecogan_tpu.parallel import batch_sharding, get_mesh, replicated


def _run_step(cfg_g, cfg_d, tcfg, batch):
    mesh = get_mesh()
    tx_g, _ = make_adam({"lr": 5e-5})
    tx_d, _ = make_adam({"lr": 5e-5})
    pg = init_frnet(jax.random.PRNGKey(0), cfg_g)
    pd = init_snet(jax.random.PRNGKey(1), cfg_d)
    vgg = None
    if tcfg.feature_crit is not None:
        vgg = jax.device_put(init_vgg19(jax.random.PRNGKey(2)),
                             replicated(mesh))
    state = jax.device_put(
        tecogan_init_state(pg, pd, tx_g, tx_d), replicated(mesh))
    step = jax.jit(functools.partial(
        tecogan_train_step, cfg_g=cfg_g, cfg_d=cfg_d, tcfg=tcfg,
        tx_g=tx_g, tx_d=tx_d))
    batch = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in batch.items()}
    return step(state, batch, vgg_params=vgg)


def test_snet_gan_step_runs(rng):
    cfg_g = FRNetConfig(nf=8, nb=2, scale=4, degradation="BD")
    cfg_d = SNetConfig(spatial_size=32, use_cond=True)
    tcfg = TrainConfig(
        scale=4, degradation="BD", sigma=1.5, tempo_extent=3,
        pixel_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        warping_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        pingpong_crit={"type": "CB", "weight": 0.5, "reduction": "mean"},
        gan_crit={"type": "GAN", "weight": 0.01, "reduction": "mean"},
        update_policy="always")
    batch = {"gt": rng.random((8, 3, 40, 40, 3)).astype(np.float32)}
    state, logs = _run_step(cfg_g, cfg_d, tcfg, batch)
    assert np.isfinite(float(logs["l_gan_G"]))
    assert float(logs["n_upd_D"]) == 1.0


def test_bi_gan_step_with_fm_loss(rng):
    """BI degradation path (paired gt+lr) + LSGAN + feature matching."""
    cfg_g = FRNetConfig(nf=8, nb=2, scale=4, degradation="BI")
    cfg_d = SNetConfig(spatial_size=32, use_cond=False)
    tcfg = TrainConfig(
        scale=4, degradation="BI", sigma=1.5, tempo_extent=3,
        pixel_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        warping_crit=None,
        pingpong_crit={"type": "CB", "weight": 0.5, "reduction": "mean"},
        feature_matching_crit={"type": "L1", "weight": 1,
                               "reduction": "mean"},
        gan_crit={"type": "LSGAN", "weight": 0.01, "reduction": "mean"},
        update_policy="always")
    batch = {
        "gt": rng.random((8, 3, 32, 32, 3)).astype(np.float32),
        "lr": rng.random((8, 3, 8, 8, 3)).astype(np.float32),
    }
    state, logs = _run_step(cfg_g, cfg_d, tcfg, batch)
    assert np.isfinite(float(logs["l_fm_G"]))
    assert float(logs["l_fm_G"]) != 0.0
    assert np.isfinite(float(logs["l_gan_G"]))


def test_mixed_precision_gan_step(rng):
    """bf16 compute path: step runs, losses finite, fp32 params updated."""
    cfg_g = FRNetConfig(nf=8, nb=2, scale=4, degradation="BD")
    cfg_d = SNetConfig(spatial_size=32, use_cond=True)
    tcfg = TrainConfig(
        scale=4, degradation="BD", sigma=1.5, tempo_extent=3,
        pixel_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        warping_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        pingpong_crit={"type": "CB", "weight": 0.5, "reduction": "mean"},
        gan_crit={"type": "GAN", "weight": 0.01, "reduction": "mean"},
        update_policy="always", mixed_precision=True)
    batch = {"gt": (rng.random((8, 3, 40, 40, 3)) * 255).astype(np.uint8)}
    state, logs = _run_step(cfg_g, cfg_d, tcfg, batch)
    for k in ("l_pix_G", "l_gan_D", "l_gan_G", "distance"):
        assert np.isfinite(float(logs[k])), k
    # master params stay fp32
    import jax.numpy as jnp
    for leaf in jax.tree.leaves(state["g"]):
        assert leaf.dtype == jnp.float32


def test_no_pingpong_stnet_step_runs(rng):
    """Without ping-pong the forward flow comes from an EXTRA FNet pass
    (`tecogan_nets.py:413-425`); exercise that branch end-to-end (the
    default test matrix always enables pingpong_crit)."""
    from tecogan_tpu.models.networks import STNetConfig, init_stnet

    cfg_g = FRNetConfig(nf=8, nb=2, scale=4, degradation="BD")
    cfg_d = STNetConfig(spatial_size=32, degradation="BD", scale=4)
    tcfg = TrainConfig(
        scale=4, degradation="BD", sigma=1.5, tempo_extent=3,
        pixel_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        warping_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        gan_crit={"type": "GAN", "weight": 0.01, "reduction": "mean"},
        update_policy="always")
    assert tcfg.pingpong_crit is None
    mesh = get_mesh()
    tx_g, _ = make_adam({"lr": 5e-5})
    tx_d, _ = make_adam({"lr": 5e-5})
    pg = init_frnet(jax.random.PRNGKey(0), cfg_g)
    pd = init_stnet(jax.random.PRNGKey(1), cfg_d)
    state = jax.device_put(
        tecogan_init_state(pg, pd, tx_g, tx_d), replicated(mesh))
    step = jax.jit(functools.partial(
        tecogan_train_step, cfg_g=cfg_g, cfg_d=cfg_d, tcfg=tcfg,
        tx_g=tx_g, tx_d=tx_d))
    batch = {"gt": jax.device_put(
        rng.random((8, 3, 40, 40, 3)).astype(np.float32),
        batch_sharding(mesh))}
    state, logs = step(state, batch, vgg_params=None)
    assert np.isfinite(float(logs["l_gan_G"]))
    assert np.isfinite(float(logs["l_gan_D"]))


def test_non_div8_train_crop_rejected(rng):
    """A training LR crop not divisible by 8 (FNet pools floor odd sizes)
    must fail at the step boundary with the config knob named — it used
    to blow up deep inside the warping loss / flow-merge shapes. The
    reference shares the constraint (its configs always use /8 crops)."""
    cfg_g = FRNetConfig(nf=8, nb=2, scale=4, degradation="BD")
    from tecogan_tpu.models.schedules import make_adam as _ma
    from tecogan_tpu.models.steps import frvsr_init_state, frvsr_train_step

    tcfg = TrainConfig(
        scale=4, degradation="BD", sigma=1.5, tempo_extent=3,
        pixel_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        warping_crit={"type": "CB", "weight": 1, "reduction": "mean"})
    tx_g, _ = _ma({"lr": 1e-4})
    pg = init_frnet(jax.random.PRNGKey(0), cfg_g)
    state = frvsr_init_state(pg, tx_g)
    # GT 48 -> BD border crop 40 -> LR 10
    batch = {"gt": rng.random((2, 3, 48, 48, 3)).astype(np.float32)}
    with pytest.raises(ValueError, match="multiple of 8"):
        frvsr_train_step(state, batch, cfg_g=cfg_g, tcfg=tcfg, tx_g=tx_g)
