"""GAN fine-tune for the RRDBNet enhancer — the Real-ESRGAN adversarial arm.

A pure restoration loss converges to over-smooth x4 outputs (measured:
round-4's L1-only x4 REGRESSES NIQE/BRISQUE/TOPIQ on real face crops while
improving PSNR — the classic perception-distortion tradeoff). Real-ESRGAN's
answer is adversarial training (its shipped weights are GAN-trained); this
module is the TPU-native equivalent:

- **Discriminator**: spectral-norm PatchGAN (4 strided conv stages, no BN) —
  smaller than the paper's UNet-SN but the same local-texture pressure, and
  every stage is an MXU conv.
- **Losses**: non-saturating logistic GAN (softplus form) + charbonnier pixel
  loss, Real-ESRGAN's weighting shape (pixel 1.0, perceptual 1.0,
  adversarial 0.1). The paper's VGG perceptual term is self-hosted: the
  golden-trained YOLO backbone supplies the deep features
  (train/perceptual.make_yolo_feature_loss) — zero egress blocks VGG
  weights, but the repo owns a face-trained conv pyramid of its own.
- **Staged on-device loop**: both optimizers step inside one
  ``lax.fori_loop`` over HBM-resident uint8 batches, G under an EMA shadow —
  same pattern as ``sr_train.make_sr_staged_loop`` (host-fed stepping pays
  ~1.2 s/step RTT on the tunneled chip).

Reference: Real-ESRGAN's GAN config is what `utils/enhancer.py:99-156`
implicitly loads; this trains the equivalent from our L1 checkpoint.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from facedet_tpu.train.sr_train import sr_loss

__all__ = ["PatchDiscriminator", "make_sr_gan_staged_loop"]


class PatchDiscriminator(nn.Module):
    """Spectral-norm PatchGAN: logits map over local patches.

    [B,H,W,3] in [0,1] -> [B,H/8,W/8,1] logits.
    """

    base: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        def sn_conv(feat, kernel, stride, name):
            return nn.SpectralNorm(
                nn.Conv(feat, (kernel, kernel), strides=(stride, stride),
                        padding="SAME", name=name),
            )

        # update_stats=True runs the power iteration; it lives in the
        # "batch_stats" collection like BatchNorm's running stats
        x = sn_conv(self.base, 3, 1, "c0")(x, update_stats=train)
        x = nn.leaky_relu(x, 0.2)
        x = sn_conv(self.base, 4, 2, "c1")(x, update_stats=train)
        x = nn.leaky_relu(x, 0.2)
        x = sn_conv(self.base * 2, 4, 2, "c2")(x, update_stats=train)
        x = nn.leaky_relu(x, 0.2)
        x = sn_conv(self.base * 4, 4, 2, "c3")(x, update_stats=train)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (3, 3), padding="SAME", name="out")(x)


def make_sr_gan_staged_loop(
    g_model,
    d_model,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    steps_per_dispatch: int = 50,
    pixel_weight: float = 1.0,
    adv_weight: float = 0.1,
    ema_decay: float = 0.999,
    flip: bool = True,
    percep_fn=None,
    percep_weight: float = 1.0,
):
    """Joint G/D scan-on-device loop.

    ``run(g_vars, g_ema, g_opt, d_vars, d_opt, lr_u8, hr_u8, start, key) ->
    (g_vars, g_ema, g_opt, d_vars, d_opt, metrics)`` where metrics is a dict
    of mean losses. ``start`` is the global step already taken (round-robin
    batch indexing + EMA warmup, as in make_sr_staged_loop).

    ``percep_fn(fake, hr) -> scalar`` adds Real-ESRGAN's perceptual term
    (train/perceptual.make_yolo_feature_loss — the self-hosted VGG stand-in);
    gradients flow through activations only."""

    def d_infer(d_params, d_stats, x):
        # frozen power-iteration stats: used inside the G step
        return d_model.apply(
            {"params": d_params, "batch_stats": d_stats}, x, train=False
        )

    def g_loss_fn(g_vars, d_params, d_stats, lr, hr):
        fake = g_model.apply(g_vars, lr)
        pix = sr_loss(fake, hr)
        logits = d_infer(d_params, d_stats, fake)
        adv = jnp.mean(jax.nn.softplus(-logits))  # non-saturating G loss
        total = pixel_weight * pix + adv_weight * adv
        per = jnp.float32(0.0)
        if percep_fn is not None:
            per = percep_fn(fake, hr)
            total = total + percep_weight * per
        return total, (pix, adv, per, fake)

    def d_loss_fn(d_params, d_stats, real, fake):
        real_logits, aux = d_model.apply(
            {"params": d_params, "batch_stats": d_stats}, real,
            train=True, mutable=["batch_stats"],
        )
        d_stats = aux["batch_stats"]
        fake_logits, aux = d_model.apply(
            {"params": d_params, "batch_stats": d_stats}, fake,
            train=True, mutable=["batch_stats"],
        )
        loss = jnp.mean(jax.nn.softplus(-real_logits)) + jnp.mean(
            jax.nn.softplus(fake_logits)
        )
        return loss, aux["batch_stats"]

    def run(g_vars, g_ema, g_opt, d_params, d_stats, d_opt, lr_u8, hr_u8,
            start, key):
        n_staged = lr_u8.shape[0]

        def body(i, carry):
            g_vars, g_ema, g_opt, d_params, d_stats, d_opt, sums = carry
            g = start + i
            idx = g % n_staged
            lr = jnp.take(lr_u8, idx, axis=0).astype(jnp.float32) / 255.0
            hr = jnp.take(hr_u8, idx, axis=0).astype(jnp.float32) / 255.0
            if flip:
                fl = jax.random.bernoulli(
                    jax.random.fold_in(key, i), shape=(lr.shape[0],)
                )[:, None, None, None]
                lr = jnp.where(fl, lr[:, :, ::-1, :], lr)
                hr = jnp.where(fl, hr[:, :, ::-1, :], hr)

            # G step (D frozen)
            (_gl, (pix, adv, per, fake)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(g_vars, d_params, d_stats, lr, hr)
            g_updates, g_opt = g_tx.update(g_grads, g_opt, g_vars)
            g_vars = optax.apply_updates(g_vars, g_updates)

            # D step (fresh fake, no G grad) — also advances the SN power
            # iteration via the mutated stats
            (dl, d_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(d_params, d_stats, hr, jax.lax.stop_gradient(fake))
            d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_updates)

            d = jnp.minimum(ema_decay, (1.0 + g) / (10.0 + g))
            g_ema = jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d), g_ema, g_vars
            )
            sums = {
                "pixel": sums["pixel"] + pix,
                "adv": sums["adv"] + adv,
                "percep": sums["percep"] + per,
                "d": sums["d"] + dl,
            }
            return g_vars, g_ema, g_opt, d_params, d_stats, d_opt, sums

        zero = jnp.float32(0.0)
        g_vars, g_ema, g_opt, d_params, d_stats, d_opt, sums = (
            jax.lax.fori_loop(
                0, steps_per_dispatch, body,
                (g_vars, g_ema, g_opt, d_params, d_stats, d_opt,
                 {"pixel": zero, "adv": zero, "percep": zero, "d": zero}),
            )
        )
        metrics = {k: v / steps_per_dispatch for k, v in sums.items()}
        return g_vars, g_ema, g_opt, d_params, d_stats, d_opt, metrics

    return jax.jit(run)
