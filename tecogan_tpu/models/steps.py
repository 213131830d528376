"""Jitted training steps (FRVSR pixel-loss step; TecoGAN GAN step).

Each step is a single pure function ``(state, batch) -> (state, logs)``
designed to be compiled ONCE with ``jax.jit`` over a data-parallel mesh:

- batches are sharded over the mesh's ``dp`` axis; parameters/optimizer state
  are replicated. All losses, BatchNorm statistics and the adaptive-D vote
  are global means over the sharded batch, so XLA emits the ICI collectives
  (the reference needs explicit DDP allreduce + `dist.all_reduce` + barrier,
  `vsrgan_model.py:160-198`).
- the BD degradation runs on-device inside the step (`base_model.py:55-85`
  semantics) — GT clips stream in, LR is never materialised on the host.
- the adaptive discriminator update is a ``lax.cond``: both branches are
  compiled, only one executes; the vote predicate is identical on every
  replica because it is a global mean.
- the reference's ``.detach()`` boundaries map to ``stop_gradient``: the
  D-phase fake input (`vsrgan_model.py:154`), the flow merge
  (`tecogan_nets.py:432`, inside build_flow_merge), VGG targets
  (`vsrgan_model.py:236`) and feature-matching targets (`:266`).
- the generator forward runs ONCE per step via ``jax.vjp``; both the D phase
  (through stop_gradient) and the G losses reuse it, exactly matching the
  reference's single `net_G(lr_data)` call (`vsrgan_model.py:129`).

Order of operations matches `vsrgan_model.py:98-286`: D is updated first,
then G losses are computed against the *updated* discriminator.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import backward_warp_diff, bd_border_size, downsample_bd
from .losses import define_criterion
from .networks import forward_sequence, vgg19_features
from .networks.discriminators import STNetConfig, build_flow_merge


class TrainConfig(NamedTuple):
    """Static training configuration distilled from the YAML opt dict."""
    scale: int
    degradation: str  # 'BD' | 'BI'
    sigma: float
    tempo_extent: int
    # criterion configs (None = disabled), as plain dicts from the YAML
    pixel_crit: dict | None
    warping_crit: dict | None
    feature_crit: dict | None = None
    pingpong_crit: dict | None = None
    feature_matching_crit: dict | None = None
    gan_crit: dict | None = None
    # discriminator policy
    update_policy: str = "adaptive"
    update_threshold: float = 0.4
    # same default as the YAML path (make_train_config) and the reference
    # (`vsrgan_model.py:142-143`): 1.0 = no border crop. Keeping the two
    # construction paths' defaults identical avoids a silent D-input
    # divergence for directly-constructed configs.
    crop_border_ratio: float = 1.0
    # bf16 compute for the forward/backward passes (params, optimizer and
    # all loss/BN-statistic accumulation stay fp32). Default ON since the
    # 500-iter soak verified stability + fp32 BN stats (PARITY.md); set
    # `train.mixed_precision: false` in the YAML for the fp32 escape hatch.
    # The NamedTuple default stays False so directly-constructed configs
    # (parity tests vs fp32 torch oracles) are unchanged; the YAML path
    # (make_train_config) defaults to True.
    mixed_precision: bool = False


def make_train_config(opt) -> TrainConfig:
    t = opt["train"]
    d_opt = t.get("discriminator", {})

    def crit(name):
        c = t.get(name)
        return dict(c) if c else None

    return TrainConfig(
        scale=opt["scale"],
        degradation=opt["dataset"]["degradation"]["type"],
        sigma=opt["dataset"]["degradation"].get("sigma", 1.5),
        tempo_extent=t.get("tempo_extent", 10),
        pixel_crit=crit("pixel_crit"),
        warping_crit=crit("warping_crit"),
        feature_crit=crit("feature_crit"),
        pingpong_crit=crit("pingpong_crit"),
        feature_matching_crit=crit("feature_matching_crit"),
        gan_crit=crit("gan_crit"),
        update_policy=d_opt.get("update_policy", "adaptive"),
        update_threshold=d_opt.get("update_threshold", 0.4),
        crop_border_ratio=d_opt.get("crop_border_ratio", 1.0),
        mixed_precision=t.get("mixed_precision", True),
    )


def normalize_batch(batch, compute_dtype=jnp.float32):
    """uint8 batches are normalised on device (cheap; saves 4x H2D)."""
    def norm(x):
        if x.dtype == jnp.uint8:
            return x.astype(compute_dtype) / 255.0
        return x.astype(compute_dtype)

    return {k: norm(v) for k, v in batch.items()}


def _compute_dtype(tcfg):
    return jnp.bfloat16 if tcfg.mixed_precision else jnp.float32


def prepare_bd_batch(gt, scale: int, sigma: float):
    """On-device BD degradation for a (n, t, Hb, Wb, c) GT batch.

    Returns (gt_cropped, lr): the Gaussian blur + stride-s downsample uses a
    valid conv, and the GT border the kernel consumed is cropped away
    (`base_model.py:55-85`).
    """
    b = bd_border_size(sigma)
    lr = downsample_bd(gt, scale, sigma=sigma, pad_data=False)
    lh, lw = lr.shape[-3], lr.shape[-2]
    gt = gt[..., b:b + scale * lh, b:b + scale * lw, :]
    return gt, lr


def _check_train_crop(lh: int, lw: int):
    """Training LR crops must be multiples of 8: FNet's pooling floors
    odd sizes, so a non-/8 crop gives a flow smaller than the frames and
    the warping loss / flow-merge shapes blow up deep inside the step
    (the reference has the identical constraint — its configs always use
    /8 crops and its warp loss crashes the same way otherwise). Fail at
    the step boundary with the actual knob named instead."""
    if lh % 8 or lw % 8:
        raise ValueError(
            f"training LR crop {lh}x{lw} is not a multiple of 8; pick a "
            f"dataset crop_size whose LR (crop/scale, after the BD border "
            f"for on-the-fly BD) is divisible by 8 — e.g. the reference's "
            f"128")


def _warp_loss(crit, out):
    lr_warp = backward_warp_diff(out["lr_prev"], out["lr_flow"])
    return crit(lr_warp, out["lr_curr"])


def _ema_update(running, current, decay, step):
    """Device-side EMA of the log dict (reference `base_model.py:170-183`)."""
    def upd(r, c):
        c = jnp.asarray(c, jnp.float32)
        return jnp.where(step == 0, c, decay * r + (1.0 - decay) * c)

    return {k: upd(running[k], current[k]) for k in running}


# --------------------------------------------------------------------------
# FRVSR step
# --------------------------------------------------------------------------

FRVSR_LOG_KEYS = ("l_pix_G", "l_warp_G")


def frvsr_train_step(state, batch, *, cfg_g, tcfg: TrainConfig, tx_g,
                     log_decay: float = 0.99):
    """One FRVSR iteration (`vsr_model.py:61-95`): pixel + warping loss."""
    dt = _compute_dtype(tcfg)
    batch = normalize_batch(batch, dt)
    if tcfg.degradation == "BD" and "lr" not in batch:
        gt, lr = prepare_bd_batch(batch["gt"], tcfg.scale, tcfg.sigma)
    else:
        gt, lr = batch["gt"], batch["lr"]
    _check_train_crop(lr.shape[-3], lr.shape[-2])

    pix_crit = define_criterion(tcfg.pixel_crit)
    if pix_crit is None:
        # unlike the GAN step's optional criteria, FRVSR without a pixel
        # loss has no training signal at all — a clear config error beats
        # the AttributeError (or a silent zero-gradient run) it would hit
        raise ValueError(
            "FRVSR training requires train.pixel_crit (reference "
            "vsr_model.py:61-95 always defines it)")
    warp_crit = define_criterion(tcfg.warping_crit)
    pix_w = tcfg.pixel_crit.get("weight", 1.0)
    warp_w = tcfg.warping_crit.get("weight", 1.0) if tcfg.warping_crit else 0.0

    def loss_fn(params):
        from .. import nn

        if tcfg.mixed_precision:
            params = nn.cast_params(params, dt)
        out = forward_sequence(params, lr, cfg_g)
        l_pix = pix_w * pix_crit(out["hr_data"], gt)
        logs = {"l_pix_G": l_pix}
        loss = l_pix
        if warp_crit is not None:
            l_warp = warp_w * _warp_loss(warp_crit, out)
            loss = loss + l_warp
            logs["l_warp_G"] = l_warp
        for k in FRVSR_LOG_KEYS:  # static log structure for the jit cache
            logs.setdefault(k, jnp.zeros((), jnp.float32))
        return loss, logs

    grads, logs = jax.grad(loss_fn, has_aux=True)(state["g"])
    updates, opt_g = tx_g.update(grads, state["opt_g"], state["g"])
    new_g = jax.tree.map(lambda p, u: p + u, state["g"], updates)

    step = state["step"]
    new_state = {
        "g": new_g,
        "opt_g": opt_g,
        "step": step + 1,
        "running_log": _ema_update(state["running_log"], logs, log_decay,
                                   step),
    }
    return new_state, logs


def frvsr_init_state(params_g, tx_g):
    return {
        "g": params_g,
        "opt_g": tx_g.init(params_g),
        "step": jnp.zeros((), jnp.int32),
        "running_log": {k: jnp.zeros((), jnp.float32) for k in
                        FRVSR_LOG_KEYS},
    }


# --------------------------------------------------------------------------
# TecoGAN step
# --------------------------------------------------------------------------

TECOGAN_LOG_KEYS = (
    "l_gan_D", "p_real_D", "p_fake_D", "distance", "n_upd_D",
    "l_pix_G", "l_warp_G", "l_feat_G", "l_pp_G", "l_fm_G", "l_gan_G",
    "p_fake_G",
)


def tecogan_train_step(state, batch, *, cfg_g, cfg_d, tcfg: TrainConfig,
                       tx_g, tx_d, sched_d=None, vgg_params=None,
                       log_decay: float = 0.99):
    """One TecoGAN iteration (`vsrgan_model.py:98-286`).

    ``sched_d``: when tx_d was built with ``make_adam(..., external_lr=
    True)``, pass its schedule here — D updates are multiplied by
    ``sched_d(global_step)`` so the D learning rate tracks the training
    ITERATION, not the (adaptive-policy-dependent) count of applied
    updates."""
    if getattr(tx_d, "external_lr", False) and sched_d is None:
        raise ValueError(
            "tx_d was built with make_adam(external_lr=True) (unscaled "
            "sign-step updates) but no sched_d was passed — updates would "
            "be applied at effective learning rate 1.0. Pass the schedule "
            "returned alongside the transform.")
    dt = _compute_dtype(tcfg)
    batch = normalize_batch(batch, dt)
    if tcfg.degradation == "BD" and "lr" not in batch:
        gt, lr = prepare_bd_batch(batch["gt"], tcfg.scale, tcfg.sigma)
    else:
        gt, lr = batch["gt"], batch["lr"]

    n, t, lh, lw, c = lr.shape
    _check_train_crop(lh, lw)
    gh, gw = gt.shape[2], gt.shape[3]

    pix_crit = define_criterion(tcfg.pixel_crit)
    warp_crit = define_criterion(tcfg.warping_crit)
    feat_crit = define_criterion(tcfg.feature_crit)
    pp_crit = define_criterion(tcfg.pingpong_crit)
    fm_crit = define_criterion(tcfg.feature_matching_crit)
    gan_crit = define_criterion(tcfg.gan_crit)
    if gan_crit is None:
        # unlike the optional criteria above, the GAN step is built around
        # the adversarial loss (D loss + G's l_gan term) — a clear config
        # error beats the NoneType trace-time error it would hit below
        raise ValueError(
            "TecoGAN training requires train.gan_crit (reference "
            "vsrgan_model.py:147-198 always defines it); train without a "
            "discriminator by using model.name: FRVSR instead")
    use_pp = pp_crit is not None

    # bicubic-conditioned data for the discriminator (`vsrgan_model.py:105-108`)
    bi = cfg_g.upsample_fn(lr.reshape(n * t, lh, lw, c)).reshape(
        n, t, gh, gw, c)

    # ping-pong doubling: (0..t-1) -> (0..t-1, t-2..0)  (`:112-119`)
    if use_pp:
        dbl = lambda x: jnp.concatenate([x, x[:, ::-1][:, 1:]], axis=1)
        lr, gt, bi = dbl(lr), dbl(gt), dbl(bi)

    # === G forward (once; reused by D phase and G losses) ===
    from .. import nn

    if vgg_params is not None and tcfg.mixed_precision:
        # pre-cast the frozen perceptual-loss VGG weights to the compute
        # dtype. The convs already ran bf16 without this (nn.conv2d casts
        # weights to the input dtype, and the VGG inputs are bf16 here) —
        # the win is eliminating the per-step f32 VGG weight HBM reads +
        # convert ops (repeated again under the vjp), ~6 ms/step at the
        # reference geometry
        vgg_params = nn.cast_params(vgg_params, dt)

    def g_fwd(pg):
        if tcfg.mixed_precision:
            pg = nn.cast_params(pg, dt)
        return forward_sequence(pg, lr, cfg_g)

    out, g_vjp = jax.vjp(g_fwd, state["g"])
    hr = out["hr_data"]
    is_stnet = isinstance(cfg_d, STNetConfig)
    ctx = {
        "lr_data": lr,
        "bi_data": bi,
        "hr_flow": None,
        "use_pp": use_pp,
        "crop_border_ratio": tcfg.crop_border_ratio,
        "fnet_params": None,
    }
    if is_stnet:
        # spatio-temporal D consumes flow-warped triplets; the flow merge is
        # built once and gradient-stopped (`tecogan_nets.py:407-432`)
        ctx["flow_merge"] = build_flow_merge(
            jax.lax.stop_gradient(out["hr_flow"]), lr,
            jax.lax.stop_gradient(state["g"]["fnet"]), cfg_d, use_pp)

    def _cast_d(pd):
        """Cast conv/dense weights to the compute dtype; BatchNorm leaves
        stay fp32 — batch_norm computes in fp32 internally anyway, and
        casting the running mean/var would bf16-quantise the EMA that
        _merge_bn_stats writes back every step."""
        def cast(k, v):
            if k == "bn":
                return v
            if isinstance(v, dict):
                return {k2: cast(k2, v2) for k2, v2 in v.items()}
            return v.astype(dt) if jnp.issubdtype(v.dtype,
                                                  jnp.floating) else v

        return {k: cast(k, v) for k, v in pd.items()}

    # === D phase ===
    # The D inputs for the vote + D loss depend on (gt, hr, flows) but
    # NOT on D's parameters, so they are assembled exactly once — the flow
    # warp inside the STNet assembly dominates a D evaluation at this
    # geometry, and the naive structure (assembly inside every D apply)
    # was measured to spend ~40% of the whole GAN step on repeated
    # identical warps.
    from .networks import build_d_input, trunk_apply

    x_real = jax.lax.stop_gradient(build_d_input(gt, ctx, cfg_d))
    # One differentiable assembly of the fake D input serves BOTH phases:
    # its stop-gradient'd value is the D-phase x_fake, and the G phase
    # pulls gradients back through `asm_vjp` instead of re-running the
    # whole assembly (b72 HR warps + triplet concat) inside g_loss_fn —
    # the assembly is parameter-independent, so unlike the trunk it does
    # not see the D update and may be shared across phases.
    x_fake_g, asm_vjp = jax.vjp(
        lambda h: build_d_input(h, ctx, cfg_d), hr)
    x_fake = jax.lax.stop_gradient(x_fake_g)

    # One vjp-traced forward produces the vote logits, the fm-loss real
    # features and the BN stats; the reference reuses its real/fake
    # forwards for the backward the same way (`vsrgan_model.py:147-188`);
    # value parity is unaffected because train-mode BN output does not
    # read the running stats. The PULLBACK is invoked only inside the
    # lax.cond's do_update branch, so iterations whose adaptive vote
    # skips the D update do not pay the D backward pass.
    def d_loss_fn(pd):
        if tcfg.mixed_precision:
            pd = _cast_d(pd)
        rl, rfeats, pd1 = trunk_apply(pd, x_real, train=True)
        fl, _, pd2 = trunk_apply(pd1, x_fake, train=True)
        loss = gan_crit(rl, True) + gan_crit(fl, False)
        return loss, (rl, rfeats, fl, pd2)

    loss_d_val, d_bwd, (real_logits, real_feats, fake_logits, pd2) = (
        jax.vjp(d_loss_fn, state["d"], has_aux=True))

    # adaptive update vote: global means -> identical verdict on every
    # replica (fp32 regardless of compute dtype)
    rl32 = real_logits.astype(jnp.float32)
    fl32 = fake_logits.astype(jnp.float32)
    logged_real = jnp.mean(jnp.log(jax.nn.sigmoid(rl32) + 1e-8))
    logged_fake = jnp.mean(jnp.log(jax.nn.sigmoid(fl32) + 1e-8))
    distance = logged_real - logged_fake
    if tcfg.update_policy == "adaptive":
        upd_d = distance < tcfg.update_threshold
    else:
        upd_d = jnp.asarray(True)

    def do_update(operand):
        pd, opt_d = operand
        grads_d = d_bwd(jnp.ones((), loss_d_val.dtype))[0]
        updates, new_opt_d = tx_d.update(grads_d, opt_d, pd)
        if sched_d is not None:
            lr_now = sched_d(state["step"])
            updates = jax.tree.map(lambda u: u * lr_now, updates)
        new_pd = jax.tree.map(lambda p, u: p + u, pd, updates)
        return new_pd, new_opt_d, loss_d_val.astype(
            pd["dense"]["w"].dtype)

    def skip_update(operand):
        pd, opt_d = operand
        return pd, opt_d, jnp.zeros((), pd["dense"]["w"].dtype)

    new_d, new_opt_d, loss_d = jax.lax.cond(
        upd_d, do_update, skip_update, (state["d"], state["opt_d"]))
    cnt_upd = state["cnt_upd_d"] + upd_d.astype(jnp.float32)

    # carry BN running stats from the real+fake forwards into the updated D
    # (torch updates them in-place during those forwards)
    new_d = _merge_bn_stats(new_d, pd2)

    # === G phase: losses against the UPDATED discriminator ===
    def g_loss_fn(g_out, x_asm, pd):
        hr_g = g_out["hr_data"]
        logs = {}
        loss = 0.0
        if pix_crit is not None:
            l_pix = tcfg.pixel_crit.get("weight", 1) * pix_crit(hr_g, gt)
            loss += l_pix
            logs["l_pix_G"] = l_pix
        if warp_crit is not None:
            l_warp = tcfg.warping_crit.get("weight", 1) * _warp_loss(
                warp_crit, g_out)
            loss += l_warp
            logs["l_warp_G"] = l_warp
        if feat_crit is not None:
            layers = tuple(tcfg.feature_crit.get(
                "feature_layers", [8, 17, 26, 35]))
            t_all = hr_g.shape[1]
            hr_m = hr_g.reshape(n * t_all, gh, gw, c)
            hr_f = vgg19_features(vgg_params, hr_m, layers)
            if use_pp:
                # the ping-pong-doubled gt repeats its first te frames
                # mirrored; VGG is per-image, so compute features on the
                # unique frames and double THEM — 36 of 76 gt VGG
                # forwards disappear (hr frames are all distinct: the
                # reversed half is generated under reversed recurrence)
                te = tcfg.tempo_extent
                gt_u = gt[:, :te].reshape(n * te, gh, gw, c)
                gt_f = [
                    dbl(f.reshape(n, te, *f.shape[1:])).reshape(
                        n * t_all, *f.shape[1:])
                    for f in vgg19_features(vgg_params, gt_u, layers)]
            else:
                gt_m = gt.reshape(n * t_all, gh, gw, c)
                gt_f = vgg19_features(vgg_params, gt_m, layers)
            l_feat = sum(
                feat_crit(hf, jax.lax.stop_gradient(gf))
                for hf, gf in zip(hr_f, gt_f))
            l_feat = tcfg.feature_crit.get("weight", 1) * l_feat
            loss += l_feat
            logs["l_feat_G"] = l_feat
        if pp_crit is not None:
            te = tcfg.tempo_extent
            hr_fw = hr_g[:, :te - 1]
            hr_bw = hr_g[:, te:][:, ::-1]
            l_pp = tcfg.pingpong_crit.get("weight", 1) * pp_crit(hr_fw, hr_bw)
            loss += l_pp
            logs["l_pp_G"] = l_pp
        # fresh D forward on non-detached hr (updates BN stats a 3rd time);
        # the input assembly is the shared x_asm — only the trunk reruns
        if tcfg.mixed_precision:
            pd = _cast_d(pd)
        fake_g_logits, fake_g_feats, pd3 = trunk_apply(
            pd, x_asm, train=True)
        if fm_crit is not None:
            layer_norm = tcfg.feature_matching_crit.get(
                "layer_norm", [12.0, 14.0, 24.0, 100.0])
            l_fm = sum(
                fm_crit(ff, jax.lax.stop_gradient(rf)) / ln
                for ff, rf, ln in zip(fake_g_feats, real_feats, layer_norm))
            l_fm = tcfg.feature_matching_crit.get("weight", 1) * l_fm
            loss += l_fm
            logs["l_fm_G"] = l_fm
        l_gan = tcfg.gan_crit.get("weight", 1) * gan_crit(fake_g_logits, True)
        loss += l_gan
        logs["l_gan_G"] = l_gan
        logs["p_fake_G"] = jnp.mean(fake_g_logits)
        return loss, (logs, pd3)

    # grads wrt the generator OUTPUT pytree, pulled back through the vjp;
    # the GAN/fm path's gradient arrives as a cotangent on the shared
    # assembly and is pulled back through asm_vjp onto hr_data
    (_, (g_logs, pd3)), (out_grads, asm_grads) = jax.value_and_grad(
        g_loss_fn, argnums=(0, 1), has_aux=True)(out, x_fake_g, new_d)
    out_grads = dict(out_grads)
    out_grads["hr_data"] = out_grads["hr_data"] + asm_vjp(asm_grads)[0]
    grads_g = g_vjp(out_grads)[0]
    updates_g, new_opt_g = tx_g.update(grads_g, state["opt_g"], state["g"])
    new_g = jax.tree.map(lambda p, u: p + u, state["g"], updates_g)
    new_d = _merge_bn_stats(new_d, pd3)

    logs = {
        "l_gan_D": loss_d,
        # despite the p_ name these are RAW LOGIT means, exactly like the
        # reference's log lines (`vsrgan_model.py:194-195` logs
        # real_pred_D.mean(), no sigmoid); the adaptive vote above is the
        # one consumer that needs log-probabilities and computes its own
        "p_real_D": jnp.mean(rl32),
        "p_fake_D": jnp.mean(fl32),
        "distance": distance,
        "n_upd_D": cnt_upd,
        **g_logs,
    }
    # pad missing keys so the log pytree structure is static
    for k in TECOGAN_LOG_KEYS:
        logs.setdefault(k, jnp.zeros((), jnp.float32))

    step = state["step"]
    new_state = {
        "g": new_g,
        "d": new_d,
        "opt_g": new_opt_g,
        "opt_d": new_opt_d,
        "step": step + 1,
        "cnt_upd_d": cnt_upd,
        "running_log": _ema_update(state["running_log"], logs, log_decay,
                                   step),
    }
    return new_state, logs


def _merge_bn_stats(params_d, stats_src):
    """Copy BatchNorm running statistics from ``stats_src`` into params_d."""
    new = dict(params_d)
    for k in params_d:
        if k.startswith("block"):
            blk = dict(params_d[k])
            bn = dict(blk["bn"])
            bn["mean"] = stats_src[k]["bn"]["mean"]
            bn["var"] = stats_src[k]["bn"]["var"]
            blk["bn"] = bn
            new[k] = blk
    return new


def tecogan_init_state(params_g, params_d, tx_g, tx_d):
    return {
        "g": params_g,
        "d": params_d,
        "opt_g": tx_g.init(params_g),
        "opt_d": tx_d.init(params_d),
        "step": jnp.zeros((), jnp.int32),
        "cnt_upd_d": jnp.zeros((), jnp.float32),
        "running_log": {k: jnp.zeros((), jnp.float32) for k in
                        TECOGAN_LOG_KEYS},
    }
