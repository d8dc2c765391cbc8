"""VP-SDE diffusion: forward/reverse dynamics over a dict of diffusion keys,
continuous score-matching loss, and the jitted train/eval step function.

Reference parity: e3_layers/run/sde_utils.py (C22/C23 in SURVEY.md §2).
All randomness is explicit ``jax.random`` keys (threaded through the state),
the NaN/Inf-gradient skip is a ``lax.cond`` inside the jitted step, and
gradient accumulation carries an accumulator pytree in the state — one XLA
program per step, no host round-trips.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _broadcast_t(batch, t):
    """Per-graph t -> per-node column, via the node segment (clamped)."""
    seg = batch["_node_segment"]
    g = t.shape[0]
    return t.reshape(-1)[jnp.clip(seg, 0, g - 1)][:, None]


class VPSDE:
    """Variance-preserving SDE over a dict {diffused_key: dim}.

    Reference parity: sde_utils.py:31-123.
    """

    def __init__(self, diffusion_keys: Dict[str, int], beta_min=0.1,
                 beta_max=20, N=1000):
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)
        self.N = int(N)
        self.discrete_betas = np.linspace(beta_min / N, beta_max / N, N)
        self.alphas = 1.0 - self.discrete_betas
        # For coarse schedules (beta_max/N >= 1, e.g. small num_scales in
        # smoke configs) the discrete alphas go non-positive and the raw
        # cumprod alternates sign, poisoning the sqrt tables with NaNs that
        # the NaN-skip guard would then silently convert into skipped steps.
        # Clamp to [0, 1]: a clamped-to-0 tail means "fully noised", which is
        # the correct limit of the continuous VP marginal.
        self.alphas_cumprod = np.clip(np.cumprod(self.alphas), 0.0, 1.0)
        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_1m_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.irreps = dict(diffusion_keys)

    @property
    def T(self):
        return 1

    def marginal_std(self, batch):
        t = _broadcast_t(batch, batch["t"])
        log_mean_coeff = (
            -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        )
        return jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))

    def marginal(self, batch, key, return_std=False):
        """Perturb the diffusion keys with the closed-form VP marginal."""
        if return_std:
            return self.marginal_std(batch)
        t = _broadcast_t(batch, batch["t"])
        log_mean_coeff = (
            -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        )
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        zs = {}
        updates = {}
        for k in self.irreps.keys():
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, batch[k].shape, batch[k].dtype)
            mean = jnp.exp(log_mean_coeff) * batch[k]
            updates[k] = mean + std * z
            zs[k] = z
        return batch.replace(**updates), {"zs": zs, "std": std}

    def sde(self, batch, key, dt=None):
        """One forward Euler-Maruyama step. Reference: sde_utils.py:68-81."""
        if dt is None:
            dt = 1.0 / self.N
        t = _broadcast_t(batch, batch["t"])
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        diffusion = jnp.sqrt(beta_t)
        updates = {}
        for k in self.irreps.keys():
            key, sub = jax.random.split(key)
            x = batch[k]
            drift = -0.5 * beta_t * x
            x_mean = x + drift * dt
            z = jax.random.normal(sub, x.shape, x.dtype)
            updates[k] = x_mean + diffusion * np.sqrt(abs(dt)) * z
        return batch.replace(**updates)

    def prior_sampling(self, batch, key):
        """randn prior over the diffusion keys. Reference: sde_utils.py:83-86."""
        updates = {}
        for k, dim in self.irreps.items():
            key, sub = jax.random.split(key)
            n = batch[k].shape[0] if k in batch else batch["_node_mask"].shape[0]
            updates[k] = jax.random.normal(sub, (n, dim), jnp.float32)
        return batch.replace(**updates)

    def reverse(self, score_fn):
        """Reverse-time SDE. Reference: sde_utils.py:88-123."""
        fwd = self

        class RSDE:
            def sde(self, batch, key):
                scores = score_fn(batch)
                t = _broadcast_t(batch, batch["t"])
                beta_t = fwd.beta_0 + t * (fwd.beta_1 - fwd.beta_0)
                diffusion = jnp.sqrt(beta_t)
                dt = -1.0 / fwd.N
                batch = fwd.sde(batch, key, dt)
                updates = {}
                for k in fwd.irreps:
                    updates[k] = (
                        batch[k] - dt * diffusion**2 * scores[f"score_{k}"]
                    )
                return batch.replace(**updates)

        rsde = RSDE()
        rsde.N = self.N
        rsde.T = self.T
        return rsde


def get_score_fn(sde: VPSDE, model, params, train: bool = False) -> Callable:
    """score = -model_out/std - x.  Reference parity: sde_utils.py:176-187."""

    def score_fn(batch):
        out = model.apply(params, batch)
        std = sde.marginal_std(batch)
        result = {}
        for k in sde.irreps.keys():
            result[f"score_{k}"] = -out[f"score_{k}"] / std - batch[k]
        return result

    return score_fn


def get_sde_loss_fn(sde: VPSDE, train: bool, reduce_mean=True,
                    continuous=True, likelihood_weighting=True,
                    eps: float = 1e-5) -> Callable:
    """Continuous score-matching loss, masked over padded nodes.

    Reference parity: sde_utils.py:125-173.
    """

    def loss_fn(model, params, batch, key):
        g = batch["_graph_mask"].shape[0]
        key, kt, kp = jax.random.split(key, 3)
        t = jax.random.uniform(kt, (g, 1)) * (sde.T - eps) + eps
        batch = batch.replace(t=t)
        batch.attrs["t"] = ("graph", "1x0e")
        batch_perturbed, misc = sde.marginal(batch, kp)
        score_fn = get_score_fn(sde, model, params, train)
        scores = score_fn(batch_perturbed)
        mask = batch["_node_mask"]
        losses = {}
        for k in sde.irreps.keys():
            res = scores[f"score_{k}"] * misc["std"] + misc["zs"][k]
            sq = jnp.square(res)
            if reduce_mean:
                per_node = jnp.mean(sq, axis=-1, keepdims=True)
            else:
                per_node = 0.5 * jnp.sum(sq, axis=-1, keepdims=True)
            losses[k] = jnp.sum(per_node * mask) / jnp.maximum(
                jnp.sum(mask), 1.0
            )
        total = sum(losses.values())
        losses["total"] = total
        return total, losses

    return loss_fn


def _all_finite(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.all(
        jnp.stack([jnp.all(jnp.isfinite(x)) for x in leaves])
    )


def init_sde_state(params, optimizer, key):
    """Flat diffusion training state. Reference parity: train.py:108."""
    return {
        "params": params,
        "opt_state": optimizer.init(params),
        "ema": {
            "params": jax.tree_util.tree_map(jnp.copy, params),
            "num_updates": jnp.zeros((), jnp.int32),
        },
        "grad_accum": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
        "rng": key,
    }


def get_step_fn(sde: VPSDE, train: bool, model=None, optimizer=None,
                reduce_mean=False, continuous=True,
                likelihood_weighting=False, grad_clid_norm=None,
                grad_acc: int = 1, ema_decay: float = 0.999,
                ema_use_num_updates: bool = True) -> Callable:
    """One jitted training/evaluation step with grad accumulation, grad
    clipping, NaN/Inf-grad skip, and EMA update.

    Reference parity: sde_utils.py:190-257.
    """
    loss_fn = get_sde_loss_fn(
        sde, train, reduce_mean=reduce_mean, continuous=continuous,
        likelihood_weighting=likelihood_weighting,
    )
    from .trainer import make_ema_update

    ema_update = make_ema_update(ema_decay, ema_use_num_updates)

    if train:

        @jax.jit
        def step_fn(state, batch):
            rng, sub = jax.random.split(state["rng"])
            (loss, losses), grads = jax.value_and_grad(
                lambda p, b, k: loss_fn(model, p, b, k), has_aux=True
            )(state["params"], batch, sub)
            accum = jax.tree_util.tree_map(
                lambda a, g: a + g, state["grad_accum"], grads
            )
            step = state["step"] + 1
            do_apply = (step % grad_acc) == 0

            def apply(operand):
                params, opt_state, accum = operand
                g = accum
                if grad_acc > 1:
                    g = jax.tree_util.tree_map(lambda x: x / grad_acc, g)
                if grad_clid_norm is not None:
                    gnorm = optax.global_norm(g)
                    scale = jnp.minimum(1.0, grad_clid_norm / (gnorm + 1e-12))
                    g = jax.tree_util.tree_map(lambda x: x * scale, g)
                finite = _all_finite(g)

                def do_update(_):
                    updates, new_opt = optimizer.update(g, opt_state, params)
                    return optax.apply_updates(params, updates), new_opt

                new_params, new_opt = jax.lax.cond(
                    finite, do_update, lambda _: (params, opt_state), None
                )
                zeroed = jax.tree_util.tree_map(jnp.zeros_like, accum)
                return new_params, new_opt, zeroed

            params, opt_state, accum = jax.lax.cond(
                do_apply,
                apply,
                lambda op: op,
                (state["params"], state["opt_state"], accum),
            )
            ema = ema_update(state["ema"], params)
            new_state = {
                "params": params,
                "opt_state": opt_state,
                "ema": ema,
                "grad_accum": accum,
                "step": step,
                "rng": rng,
            }
            return new_state, loss, losses

    else:

        @jax.jit
        def step_fn(state, batch):
            rng, sub = jax.random.split(state["rng"])
            loss, losses = loss_fn(model, state["ema"]["params"], batch, sub)
            new_state = dict(state)
            new_state["rng"] = rng
            return new_state, loss, losses

    return step_fn
