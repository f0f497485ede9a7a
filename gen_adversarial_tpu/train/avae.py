"""A-VAE WGAN-GP trainer (reference a_vae/train.py in
SerezD/gen_adversarial): critic step with drift term + 10x gradient
penalty, generator step every n_critic with KL + adversarial loss, EMA
shadow generator (accumulate 0.999).

The gradient penalty differentiates a gradient - double-backward through
the whole critic - which JAX handles exactly (grad-of-grad), including
through the blur/fused-sample ops (the reason the reference hand-writes
BlurFunctionBackward, modules.py:106-162).
"""

import jax
import jax.numpy as jnp
import optax

from gen_adversarial_tpu.models.avae.model import StyledGenerator, AVAEDiscriminator
from gen_adversarial_tpu.ops.image import avg_pool2d


def make_avae_trainers(img_size: int, kernel_size: int, lr: float = 1e-3):
    gen = StyledGenerator(img_size)
    disc = AVAEDiscriminator(img_size)

    # style MLP at lr * 0.01 (train.py:228-234)
    g_tx = optax.multi_transform(
        {"style": optax.adam(lr * 0.01, b1=0.0, b2=0.99),
         "rest": optax.adam(lr, b1=0.0, b2=0.99)},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "style" if "style_layers" in jax.tree_util.keystr(path)
            else "rest", params))
    d_tx = optax.adam(lr, b1=0.0, b2=0.99)

    def init(key, batch: int = 2):
        kg, kd, kf = jax.random.split(key, 3)
        x = jnp.zeros((batch, img_size, img_size, 3))
        pooled = avg_pool2d(x, kernel_size)
        g_vars = gen.init(kg, pooled, kf)
        d_vars = disc.init(kd, x)
        return (g_vars, g_tx.init(g_vars["params"]),
                d_vars, d_tx.init(d_vars["params"]))

    @jax.jit
    def d_step(d_vars, d_opt, g_vars, real, key):
        """Critic update (train.py:99-126)."""
        kf, ke = jax.random.split(key)
        pooled = avg_pool2d(real, kernel_size)
        _, _, fake = gen.apply(g_vars, pooled, kf)
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(params):
            dv = {**d_vars, "params": params}
            real_pred = disc.apply(dv, real)[:, 0]
            fake_pred = disc.apply(dv, fake)[:, 0]
            real_loss = -(jnp.mean(real_pred) - 0.001 * jnp.mean(real_pred ** 2))
            fake_loss = jnp.mean(fake_pred)

            eps = jax.random.uniform(ke, (real.shape[0], 1, 1, 1))
            x_hat = eps * real + (1 - eps) * fake

            def critic_sum(xh):
                return jnp.sum(disc.apply(dv, xh))

            g = jax.grad(critic_sum)(x_hat)
            gnorm = jnp.sqrt(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1))
            gp = 10.0 * jnp.mean((gnorm - 1.0) ** 2)
            return real_loss + fake_loss + gp, (real_loss + fake_loss, gp)

        (loss, (wgan, gp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_vars["params"])
        updates, d_opt = d_tx.update(grads, d_opt, d_vars["params"])
        d_vars = {**d_vars, "params": optax.apply_updates(d_vars["params"], updates)}
        return d_vars, d_opt, wgan, gp

    @jax.jit
    def g_step(g_vars, g_opt, d_vars, real, key):
        """Generator update: KL + adversarial recon (train.py:133-151)."""
        pooled = avg_pool2d(real, kernel_size)

        def loss_fn(params):
            gv = {**g_vars, "params": params}
            m, v, fake = gen.apply(gv, pooled, key)
            pred = disc.apply(d_vars, fake)[:, 0]
            rec_loss = -jnp.mean(pred)
            kl_loss = -0.5 * jnp.mean(-jnp.exp(v) - m ** 2 + v + 1)
            return kl_loss + rec_loss, (rec_loss, kl_loss)

        (loss, (rec, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g_vars["params"])
        updates, g_opt = g_tx.update(grads, g_opt, g_vars["params"])
        g_vars = {**g_vars, "params": optax.apply_updates(g_vars["params"], updates)}
        return g_vars, g_opt, rec, kl

    @jax.jit
    def accumulate(ema_params, params, decay: float = 0.999):
        """EMA shadow generator (train.py:21-26)."""
        return jax.tree.map(lambda e, p: e * decay + p * (1 - decay),
                            ema_params, params)

    return gen, disc, init, d_step, g_step, accumulate
