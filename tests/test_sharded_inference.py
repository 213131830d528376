"""Multi-chip serving path: batched streaming inference with the batch axis
sharded over the dp mesh must match unsharded per-sequence inference."""

import numpy as np

import jax
import jax.numpy as jnp

from tecogan_tpu.models.networks import (
    FRNetConfig, infer_sequence, infer_sequence_batch, init_frnet)
from tecogan_tpu.parallel import batch_sharding, get_mesh, replicated


def test_dp_sharded_batch_inference(rng):
    mesh = get_mesh()
    assert mesh.devices.size == 8
    cfg = FRNetConfig(nf=8, nb=2, scale=4, degradation="BD")
    params = jax.device_put(init_frnet(jax.random.PRNGKey(0), cfg),
                            replicated(mesh))
    lr = rng.random((8, 5, 16, 16, 3)).astype(np.float32)
    lr_sharded = jax.device_put(lr, batch_sharding(mesh))

    run = jax.jit(lambda p, x: infer_sequence_batch(p, x, cfg, chunk=5))
    out = np.asarray(run(params, lr_sharded))
    assert out.shape == (8, 5, 64, 64, 3) and out.dtype == np.uint8

    # every stream must equal its single-sequence result
    for i in (0, 3, 7):
        single = np.asarray(infer_sequence(
            jax.device_get(params), jnp.asarray(lr[i]), cfg, chunk=5))
        diff = np.abs(out[i].astype(np.int32) - single.astype(np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01


def test_put_global_matches_device_put_single_process(rng):
    """put_global (the collective-free multi-controller placement used by
    BaseModel.replicate / prepare_training_data) must be value- and
    sharding-identical to plain device_put. Its multi-process behaviour
    (per-process local-shard handover, no assert_equal allgather) is
    exercised for real by tests/test_multihost.py::test_two_process_mini_train."""
    from tecogan_tpu.parallel import put_global

    mesh = get_mesh()
    tree = {"a": np.asarray(rng.random((8, 3, 4)), np.float32),
            "b": {"w": np.asarray(rng.random((8, 5)), np.float32)}}
    # scalar leaves (e.g. the step counter) only appear under the
    # replicated sharding — P('dp') on rank-0 is invalid for device_put too
    for sh, t in ((batch_sharding(mesh), tree),
                  (replicated(mesh), {**tree, "step": np.int32(7)})):
        got = put_global(t, sh)
        ref = jax.tree.map(lambda x: jax.device_put(x, sh), t)
        jax.tree.map(
            lambda g, r: np.testing.assert_array_equal(
                np.asarray(g), np.asarray(r)), got, ref)
        assert got["a"].sharding == sh
