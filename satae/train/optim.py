"""Hand-rolled Adam matching torch.optim.Adam semantics, as a pure pytree map.

Why not optax: the grid search runs 45 (alpha, lr) configs (Report.md:599-600)
and 11 MLP lrs (Report.md:2611) through ONE compiled train step — lr and
weight_decay are *traced* scalars here, so per-config recompiles never happen
(SURVEY.md §7 "Hard parts"). The whole update is a fused XLA elementwise pass
(the reference's fused Adam CUDA kernel, SURVEY.md §2 native table).

torch parity details: betas (0.9, 0.999), eps 1e-8 added *after* sqrt of the
bias-corrected second moment; ``weight_decay`` is L2-into-gradient (classic
Adam, Report.md:2625), not decoupled AdamW.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

OptState = Dict[str, Any]


def adam_init(params: Any) -> OptState:
    zeros = lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    return {"mu": zeros(params), "nu": zeros(params),
            "step": jnp.zeros((), jnp.int32)}


def adam_update(params: Any, grads: Any, state: OptState, lr: jax.Array,
                weight_decay: float | jax.Array = 0.0, b1: float = 0.9,
                b2: float = 0.999, eps: float = 1e-8
                ) -> Tuple[Any, OptState]:
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def upd(p, g, mu, nu):
        g = g + weight_decay * p
        mu = b1 * mu + (1.0 - b1) * g
        nu = b2 * nu + (1.0 - b2) * (g * g)
        mhat = mu / bc1
        vhat = nu / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), mu, nu

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(state["mu"])
    flat_nu = treedef.flatten_up_to(state["nu"])
    out = [upd(p, g, m, n) for p, g, m, n in zip(flat_p, flat_g, flat_mu, flat_nu)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_mu = treedef.unflatten([o[1] for o in out])
    new_nu = treedef.unflatten([o[2] for o in out])
    return new_p, {"mu": new_mu, "nu": new_nu, "step": step}
