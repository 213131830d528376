"""Model wrapper base: device mesh, data staging, inference, checkpoints.

Behavioural counterpart of the reference's BaseModel (`base_model.py:14-251`)
re-shaped for single-controller JAX:

- ``prepare_training_data``: host uint8/float32 batch -> device, sharded over
  the dp mesh axis. The BD degradation itself happens *inside* the jitted
  train step (see models/steps.py), not here.
- ``prepare_inference_data``: reference semantics (`base_model.py:87-122`)
  including on-the-fly BD LR generation when no LR stream exists — executed
  on-device (the reference does this on CPU).
- ``pad_sequence``: reflect/replicate temporal front padding
  (`base_model.py:230-251`).
- checkpoints: native .npz pytrees; also exports reference-compatible .pth
  when torch is importable. Optimizer state IS saved (the reference's
  save_training_state is an empty TODO).
"""

from __future__ import annotations

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import downsample_bd
from ..parallel import batch_sharding, get_mesh, put_global, replicated
from ..utils import ckpt as ckpt_io
from ..utils.logging_utils import format_train_msg, log_info


class BaseVSRModel:
    def __init__(self, opt, mesh=None):
        self.opt = opt
        self.scale = opt["scale"]
        self.is_train = opt.get("is_train", False)
        if mesh is None:
            ids = opt.get("device_ids")
            if ids is not None and len(ids) == 0:
                # --gpu_ids -1 (config.py): explicit CPU run
                devs = jax.devices("cpu")
            elif ids:
                devs = jax.devices()
                bad = [i for i in ids if i >= len(devs) or i < 0]
                if bad:
                    # negative ids would Python-index from the END of the
                    # device list and silently run on the wrong chip
                    raise ValueError(
                        f"device ids {bad} out of range: only "
                        f"{len(devs)} devices available")
                devs = [devs[i] for i in ids]
            else:
                devs = jax.devices()
            mesh = get_mesh(devices=devs)
        self.mesh = mesh
        self.log_decay = opt.get("logger", {}).get("decay", 0.99)
        if self.is_train:
            self.ckpt_dir = opt["train"]["ckpt_dir"]

        self._infer_fn_cache = {}
        self._local_infer_params = None  # multi-host per-process copy

    # ------------------------------------------------------------------ data
    def prepare_training_data(self, batch):
        """Host batch {'gt': (n,t,H,W,c) float32 [, 'lr']} -> sharded device.

        Every process holds the identically-assembled GLOBAL batch (the
        loaders seed per-sample RNG streams by (seed, epoch, i)); put_global
        places each process's shard rows without any cross-process traffic.
        """
        sh = batch_sharding(self.mesh)
        return {k: put_global(v, sh) for k, v in batch.items()}

    def prepare_inference_data(self, data):
        """Sequence dict -> LR float32 (t, h, w, c) ndarray.

        BD without a pre-generated LR stream degrades the GT on device with
        reflect padding (`base_model.py:96-119`).
        """
        degradation = self.opt["dataset"]["degradation"]["type"]
        if "lr" in data:
            lr = np.asarray(data["lr"], np.float32)  # (t, h, w, c) in [0,1]
        else:
            assert degradation == "BD", "lr data is required for BI mode"
            sigma = self.opt["dataset"]["degradation"].get("sigma", 1.5)
            gt = jnp.asarray(data["gt"], jnp.float32) / 255.0
            lr = np.asarray(
                downsample_bd(gt, self.scale, sigma=sigma, pad_data=True))
        return lr

    def pad_sequence(self, lr_data: np.ndarray):
        mode = self.opt["test"].get("padding_mode", "reflect")
        n_pad = self.opt["test"].get("num_pad_front", 0)
        assert n_pad < len(lr_data)
        if n_pad == 0:
            return lr_data, 0
        if mode == "reflect":
            pad = lr_data[1:1 + n_pad][::-1]
        elif mode == "replicate":
            pad = np.broadcast_to(lr_data[:1], (n_pad,) + lr_data.shape[1:])
        else:
            raise ValueError(f"Unrecognized padding mode: {mode}")
        return np.concatenate([pad, lr_data], axis=0), n_pad

    # ----------------------------------------------------------------- state
    def replicate(self, tree):
        return put_global(tree, replicated(self.mesh))

    def load_generator(self, load_path: str):
        """Swap in another generator checkpoint (multi-checkpoint test
        sweeps): only the params change, so the datasets, metric stack
        (incl. LPIPS weight loads) and compiled inference executables
        (params are traced ARGUMENTS, not captures) are all reused
        instead of being rebuilt per checkpoint."""
        loaded = ckpt_io.load_generator_params(
            load_path, self.cfg_g.nb, self.cfg_g.scale)
        # structure check against the live treedef only — no device_get of
        # the whole parameter tree just to serve as a tree.map template
        if (jax.tree.structure(loaded)
                != jax.tree.structure(self.state["g"])):
            raise ValueError(
                f"{load_path} does not match the configured generator "
                f"(nb={self.cfg_g.nb}, scale={self.cfg_g.scale})")
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), loaded)
        self.state["g"] = self.replicate(params)
        self._local_infer_params = None  # invalidate the multi-host cache
        log_info(f"Load generator from: {load_path}")

    # ------------------------------------------------------------------ logs
    def get_running_log(self, state):
        return {k: float(v) for k, v in
                jax.device_get(state["running_log"]).items()}

    def get_format_msg(self, state, epoch, it):
        lr_dict = self.get_learning_rate(state)
        return format_train_msg(epoch, it, lr_dict, self.get_running_log(state))

    def get_learning_rate(self, state):
        return {}

    # ----------------------------------------------------------- checkpoints
    def save_pytree(self, tree, filename):
        path = osp.join(self.ckpt_dir, filename)
        ckpt_io.save_pytree(tree, path)
        log_info(f"Saved checkpoint: {path}")

    def save_training_state(self, state, current_iter):
        """Full-state checkpoint (params + optimizer + counters)."""
        self.save_pytree(state, f"state_iter{current_iter}.npz")

    def try_resume(self, state):
        """Auto-resume from the latest state checkpoint, if any."""
        path = ckpt_io.latest_training_state(self.ckpt_dir)
        if path is None:
            return state, False
        loaded = ckpt_io.load_pytree(path)
        # the saved pytree uses plain containers (npz round-trip); rebuild
        # with the live state's treedef (optax NamedTuples etc.) — leaf
        # order is identical since both sides sort dict keys
        ref_leaves, treedef = jax.tree.flatten(state)
        new_leaves = jax.tree.leaves(loaded)
        assert len(ref_leaves) == len(new_leaves), (
            f"checkpoint/state leaf count mismatch: {len(new_leaves)} vs "
            f"{len(ref_leaves)}")
        for i, (ref, x) in enumerate(zip(ref_leaves, new_leaves)):
            if tuple(np.shape(x)) != tuple(np.shape(ref)):
                # same tree, different widths (e.g. nf changed between
                # runs) would otherwise resume the wrong architecture
                raise ValueError(
                    f"checkpoint {path} does not match the configured "
                    f"model: leaf {i} has shape {np.shape(x)}, expected "
                    f"{np.shape(ref)}")
        leaves = [jnp.asarray(x, ref.dtype)
                  for ref, x in zip(ref_leaves, new_leaves)]
        state = jax.tree.unflatten(treedef, leaves)
        self._local_infer_params = None  # invalidate the multi-host cache
        log_info(f"Resumed training state from {path}")
        return self.replicate(state), True
