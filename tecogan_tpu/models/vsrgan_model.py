"""VSRGANModel — TecoGAN trainer (perceptual VSR).

Counterpart of the reference's VSRGANModel (`codes/models/vsrgan_model.py`):
the full GAN step (ping-pong doubling, STNet with flow-merge reuse, adaptive
discriminator updates, pixel/warp/perceptual/ping-pong/feature-matching/GAN
losses) compiled as ONE jitted function (see models/steps.py).
"""

from __future__ import annotations

import functools
import os.path as osp

import jax
import jax.numpy as jnp

from .networks import define_discriminator, init_vgg19
from .schedules import make_adam
from .steps import make_train_config, tecogan_init_state, tecogan_train_step
from .vsr_model import VSRModel
from ..utils import ckpt as ckpt_io
from ..utils.logging_utils import log_info


class VSRGANModel(VSRModel):
    def __init__(self, opt, mesh=None):
        # VSRModel.__init__ sets up the generator; skip its train wiring by
        # initialising as eval first, then build the GAN training state.
        is_train = opt.get("is_train", False)
        opt_eval = dict(opt)
        opt_eval["is_train"] = False
        super().__init__(opt_eval, mesh)
        self.opt = opt
        self.is_train = is_train

        if not is_train:
            return

        self.ckpt_dir = opt["train"]["ckpt_dir"]
        self.tcfg = make_train_config(opt)
        params_g = jax.device_get(self.state["g"])

        # discriminator
        self.cfg_d, init_d, self._apply_d = define_discriminator(opt)
        seed = opt.get("manual_seed", 2021)
        params_d = init_d(jax.random.PRNGKey(seed + 1))
        load_path_d = opt["model"]["discriminator"].get("load_path")
        if load_path_d:
            params_d = self._load_discriminator(load_path_d, params_d)
            log_info(f"Load discriminator from: {load_path_d}")

        # frozen VGG19 for the perceptual loss
        self.vgg_params = None
        if self.tcfg.feature_crit is not None:
            self.vgg_params = self._load_vgg(opt, seed)

        self.tx_g, self.sched_g = make_adam(opt["train"]["generator"])
        # external LR for D: the adaptive policy skips updates, so the
        # schedule must be driven by the global step (see make_adam)
        self.tx_d, self.sched_d = make_adam(opt["train"]["discriminator"],
                                            external_lr=True)

        state = tecogan_init_state(params_g, params_d, self.tx_g, self.tx_d)
        self.state = self.replicate(state)
        if self.vgg_params is not None:
            self.vgg_params = self.replicate(self.vgg_params)

        self._train_step = jax.jit(
            functools.partial(
                tecogan_train_step, cfg_g=self.cfg_g, cfg_d=self.cfg_d,
                tcfg=self.tcfg, tx_g=self.tx_g, tx_d=self.tx_d,
                sched_d=self.sched_d, log_decay=self.log_decay),
            donate_argnums=(0,))

    def _load_discriminator(self, path, params_ref):
        if path.endswith(".pth"):
            from . import convert

            sd = convert.load_state_dict(path)
            loaded = convert.convert_stnet(sd, self.cfg_d.spatial_size)
        else:
            loaded = ckpt_io.load_pytree(path)
        return jax.tree.map(lambda r, x: jnp.asarray(x, jnp.float32),
                            params_ref, loaded)

    def _load_vgg(self, opt, seed):
        """VGG19 weights for the perceptual loss.

        The reference trains TecoGAN against ImageNet VGG19 features
        (`codes/models/networks/vgg_nets.py:6-38`); training against random
        features silently produces a non-parity model, so a missing weights
        file is a HARD error unless `feature_crit.allow_random_weights: true`
        is set explicitly (useful for smoke tests only).
        """
        fc = opt["train"]["feature_crit"]
        path = fc.get("weights_path", "pretrained_models/vgg19.npz")
        if osp.exists(path):
            log_info(f"Load VGG19 feature extractor from: {path}")
            return ckpt_io.load_pytree(path)
        if not fc.get("allow_random_weights", False):
            raise FileNotFoundError(
                f"No pretrained VGG19 weights at '{path}'. The perceptual "
                "loss requires ImageNet VGG19 features; training against "
                "random features would complete without error but produce a "
                "non-parity model. Convert the torchvision checkpoint with:\n"
                "  python -c \"import torch; from tecogan_tpu.models.convert"
                " import convert_vgg19; from tecogan_tpu.utils.ckpt import"
                " save_pytree; sd = torch.load('vgg19-dcbb9e9d.pth',"
                " map_location='cpu', weights_only=True);"
                " save_pytree(convert_vgg19(sd), "
                "'pretrained_models/vgg19.npz')\"\n"
                "or set feature_crit.allow_random_weights: true (smoke tests "
                "only), or point feature_crit.weights_path at a converted "
                ".npz.")
        log_info(
            "WARNING: no pretrained VGG19 weights found "
            f"({path}); feature_crit.allow_random_weights is set, so the "
            "perceptual loss uses RANDOM features — NOT a parity run")
        return init_vgg19(jax.random.PRNGKey(seed + 2))

    # ------------------------------------------------------------------ train
    def train(self, batch):
        self.state, logs = self._train_step(
            self.state, batch, vgg_params=self.vgg_params)
        return logs

    def get_learning_rate(self, state):
        step = int(jax.device_get(state["step"]))
        return {"lr_G": float(self.sched_g(step)),
                "lr_D": float(self.sched_d(step))}

    # ------------------------------------------------------------------- save
    def save(self, current_iter):
        params = jax.device_get(self.state["g"])
        self.save_pytree(params, f"G_iter{current_iter}.npz")
        params_d = jax.device_get(self.state["d"])
        self.save_pytree(params_d, f"D_iter{current_iter}.npz")
