"""VSRModel — FRVSR trainer/inferencer (objective VSR).

Counterpart of the reference's VSRModel (`codes/models/vsr_model.py:12-117`):
generator-only training with pixel + warping losses, streaming inference.
The train step is one jitted function over the dp mesh (donated state).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh

from .base import BaseVSRModel
from .networks import define_generator, infer_sequence, infer_sequence_sp
from .schedules import make_adam
from .steps import frvsr_init_state, frvsr_train_step, make_train_config
from ..utils import ckpt as ckpt_io
from ..utils.logging_utils import log_info


class VSRModel(BaseVSRModel):
    def __init__(self, opt, mesh=None):
        super().__init__(opt, mesh)
        self.cfg_g, init_fn = define_generator(opt)

        seed = opt.get("manual_seed", 2021)
        params = init_fn(jax.random.PRNGKey(seed))

        load_path = opt["model"]["generator"].get("load_path")
        if load_path:
            params = jax.tree.map(
                lambda ref, x: jnp.asarray(x, jnp.float32), params,
                ckpt_io.load_generator_params(
                    load_path, self.cfg_g.nb, self.cfg_g.scale))
            log_info(f"Load generator from: {load_path}")

        if self.is_train:
            self.tcfg = make_train_config(opt)
            self.tx_g, self.sched_g = make_adam(opt["train"]["generator"])
            state = frvsr_init_state(params, self.tx_g)
            self.state = self.replicate(state)
            self._train_step = jax.jit(
                functools.partial(
                    frvsr_train_step, cfg_g=self.cfg_g, tcfg=self.tcfg,
                    tx_g=self.tx_g, log_decay=self.log_decay),
                donate_argnums=(0,))
        else:
            self.state = {"g": self.replicate(params)}

    # ------------------------------------------------------------------ train
    def train(self, batch):
        """One optimisation step on a device batch; returns the log dict."""
        self.state, logs = self._train_step(self.state, batch)
        return logs

    def get_learning_rate(self, state):
        step = int(jax.device_get(state["step"]))
        return {"lr_G": float(self.sched_g(step))}

    # ------------------------------------------------------------------ infer
    def _sp_mesh_for(self, h: int) -> Mesh | None:
        """Spatial-partition mesh for an h-row LR frame, or None.

        Opt-in via ``test.spatial_partition: true`` (no reference
        counterpart — the reference pins one stream per GPU,
        `codes/main.py:248-262`): shard ONE stream's rows over this
        model's local devices for single-stream latency on large frames.
        Picks the largest device count k with ``h % k == 0`` and
        ``(h/k) % 8 == 0`` (FNet pooling alignment); falls back to the
        single-chip path (with a log note) when none fits. Multi-host
        test mode round-robins *different* sequences per process, which
        is incompatible with one gang-scheduled SPMD program — SP is
        single-process only.
        """
        if not self.opt.get("test", {}).get("spatial_partition", False):
            return None
        if jax.process_count() > 1:
            return None
        devs = list(self.mesh.devices.flat)
        if len(devs) < 2:
            return None
        for k in range(len(devs), 1, -1):
            if h % k == 0 and (h // k) % 8 == 0:
                return Mesh(np.asarray(devs[:k]), axis_names=("sp",))
        log_info(f"spatial_partition: no device count in [2, {len(devs)}] "
                 f"divides h={h} into /8 row blocks; using one device")
        return None

    def infer(self, lr_data: np.ndarray, chunk: int = 16) -> np.ndarray:
        """LR sequence (t, h, w, c) float32 -> SR uint8 (t, sh, sw, c).

        Front-pads the sequence to warm up the recurrent state, then trims
        (`vsr_model.py:97-113`).
        """
        lr_data, n_pad = self.pad_sequence(lr_data)
        sp_mesh = self._sp_mesh_for(lr_data.shape[1])
        if sp_mesh is not None:
            key = ("sp", sp_mesh.shape["sp"], chunk)
            if key not in self._infer_fn_cache:
                self._infer_fn_cache[key] = jax.jit(functools.partial(
                    infer_sequence_sp, cfg=self.cfg_g, mesh=sp_mesh,
                    chunk=chunk))
            hr = self._infer_fn_cache[key](self.state["g"],
                                           jnp.asarray(lr_data))
            return np.asarray(hr[n_pad:])
        # one jit wrapper per chunk size (bounded); jit's own cache handles
        # per-shape retraces — keying the dict by input shape would hold a
        # duplicate executable per sequence geometry forever
        if chunk not in self._infer_fn_cache:
            self._infer_fn_cache[chunk] = jax.jit(
                functools.partial(infer_sequence, cfg=self.cfg_g, chunk=chunk))
        g = self.state["g"]
        if jax.process_count() > 1:
            # multi-host: the test loop round-robins DIFFERENT sequences
            # (shapes, counts) to each process, so inference must NOT run
            # on globally-sharded params — per-rank divergent programs on a
            # global mesh violate the SPMD gang-scheduling contract and
            # deadlock. Pull the (replicated) params to this process's
            # local device and run purely locally. The localized copy is
            # cached keyed on the SOURCE TREE's identity (holding the ref
            # keeps ids stable), so a test sweep localizes once per
            # generator instead of round-tripping the whole tree per
            # sequence, while in-training validation (state['g'] changes
            # every step) still localizes fresh params each round.
            cached = getattr(self, "_local_infer_params", None)
            if cached is None or cached[0] is not g:
                self._local_infer_params = (
                    g, jax.device_put(jax.device_get(g),
                                      jax.local_devices()[0]))
            g = self._local_infer_params[1]
        hr = self._infer_fn_cache[chunk](g, jnp.asarray(lr_data))
        return np.asarray(hr[n_pad:])

    # ------------------------------------------------------------------- save
    def save(self, current_iter):
        params = jax.device_get(self.state["g"])
        self.save_pytree(params, f"G_iter{current_iter}.npz")

    def save_training_state_now(self, current_iter):
        self.save_training_state(self.state, current_iter)
