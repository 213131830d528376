"""bf16 inference-path quality bound + training-state save/resume."""

import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp

from tecogan_tpu.models.networks import FRNetConfig, infer_sequence, init_frnet


def test_bf16_inference_close_to_fp32(rng):
    cfg32 = FRNetConfig(nf=16, nb=2, scale=4, degradation="BD")
    cfg16 = FRNetConfig(nf=16, nb=2, scale=4, degradation="BD",
                        compute_dtype="bfloat16")
    # random kaiming weights produce unrealistically large activations; a
    # trained generator emits small residuals on top of the bicubic path —
    # emulate that by scaling the random weights down
    params = init_frnet(jax.random.PRNGKey(0), cfg32)
    params = jax.tree.map(lambda x: x * 0.05, params)
    lr = rng.random((6, 16, 16, 3)).astype(np.float32)
    a = np.asarray(infer_sequence(params, jnp.asarray(lr), cfg32, chunk=6))
    b = np.asarray(infer_sequence(params, jnp.asarray(lr), cfg16, chunk=6))
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    # bf16 trunk must stay within a few uint8 quantisation steps of fp32
    assert diff.mean() < 1.0 and np.percentile(diff, 99) <= 4


def test_training_state_resume(tmp_path, rng):
    """Optimizer state survives a save/load cycle and training continues
    bit-identically (the reference loses Adam moments on resume)."""
    from tecogan_tpu.models import VSRModel

    ckpt_dir = str(tmp_path / "ckpt")
    opt = {
        "scale": 4, "manual_seed": 0, "is_train": True,
        "exp_dir": str(tmp_path), "device_ids": [0],
        "dataset": {"degradation": {"type": "BD", "sigma": 1.5},
                    "train": {"crop_size": 32}},
        "model": {"name": "FRVSR",
                  "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                                "nf": 8, "nb": 2}},
        "train": {"tempo_extent": 3, "ckpt_dir": ckpt_dir,
                  "generator": {"lr": 1e-4,
                                "lr_schedule": {"type": "FixedLR"}},
                  "pixel_crit": {"type": "CB", "weight": 1,
                                 "reduction": "mean"},
                  "warping_crit": {"type": "CB", "weight": 1,
                                   "reduction": "mean"}},
        "logger": {"decay": 0.99},
    }
    batch = {"gt": rng.random((1, 3, 40, 40, 3)).astype(np.float32)}

    m1 = VSRModel(opt)
    m1.train(m1.prepare_training_data(batch))
    m1.train(m1.prepare_training_data(batch))
    m1.save_training_state(m1.state, 2)
    assert osp.exists(osp.join(ckpt_dir, "state_iter2.npz"))
    m1.train(m1.prepare_training_data(batch))
    want = jax.device_get(m1.state["g"])

    m2 = VSRModel(opt)
    m2.state, resumed = m2.try_resume(m2.state)
    assert resumed and int(jax.device_get(m2.state["step"])) == 2
    m2.train(m2.prepare_training_data(batch))
    got = jax.device_get(m2.state["g"])

    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(a, b)


def test_resume_rejects_mismatched_architecture(tmp_path, rng):
    """Same tree, different widths (nf changed between runs) must fail at
    load time, not resume the wrong architecture silently."""
    import pytest

    from tecogan_tpu.models import define_model

    def opt_for(nf):
        return {
            "scale": 4, "manual_seed": 0, "is_train": True,
            "dataset": {"degradation": {"type": "BD", "sigma": 1.5}},
            "model": {"name": "FRVSR",
                      "generator": {"name": "FRNet", "in_nc": 3,
                                    "out_nc": 3, "nf": nf, "nb": 2}},
            "train": {"ckpt_dir": str(tmp_path), "tempo_extent": 3,
                      "generator": {"lr": 1e-4,
                                    "lr_schedule": {"type": "FixedLR"},
                                    "betas": [0.9, 0.999]},
                      "pixel_crit": {"type": "CB", "weight": 1,
                                     "reduction": "mean"}},
            "logger": {"decay": 0.99},
        }

    m8 = define_model(opt_for(8))
    m8.save_training_state(m8.state, 3)
    m16 = define_model(opt_for(16))
    with pytest.raises(ValueError, match="does not match"):
        m16.try_resume(m16.state)
