"""PI controller producing the KL weight beta (MAGE+ auto-beta).

Semantics parity with the reference PIDControl (modules/mage_model.py:394-434):
P term ``Kp / (1 + exp(err))``, integral accumulation with the (vestigial)
anti-windup guard, output clamped to [0, 1].

Two implementations of the same math:

- ``pid_update``: jax-traceable, runs INSIDE the jitted train step so
  beta_t is computed from step t's KL and weights step t's loss — the
  reference's exact same-step semantics (mage_model.py:628-631, which
  reads kl.item() synchronously mid-forward; here the controller state is
  three jnp scalars carried through the step instead of a device sync).
- ``PIDControl``: the host-side float twin (used by tests and any host
  loop that wants the controller without jit).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def initial_pid_state() -> jax.Array:
    """Controller state [i_k1, w_k1, e_k1] — all zero at t=0
    (reference __init__, mage_model.py:401-404)."""
    return jnp.zeros((3,), jnp.float32)


def pid_update(
    pid_state: jax.Array,
    exp_kl,
    kl_loss,
    kp: float = 0.01,
    ki: float = -0.0001,
) -> tuple[jax.Array, jax.Array]:
    """One controller step -> (beta in [0, 1], new [i_k1, w_k1, e_k1]).

    Bit-for-bit the math of ``PIDControl.pid`` below (itself matching the
    reference mage_model.py:406-434), traceable under jit. The reference's
    anti-windup guard ``w_k1 < 0 and w_k1 >= 1`` is vacuously false and
    kept only in the host twin for documentation."""
    i_k1 = pid_state[0]
    err = jnp.float32(exp_kl) - jnp.asarray(kl_loss, jnp.float32)
    # Kp / (1 + exp(err)); the reference guards err > 60 against overflow
    pk = kp * jnp.where(
        err > 60.0, 0.0, 1.0 / (1.0 + jnp.exp(jnp.minimum(err, 60.0)))
    )
    ik = i_k1 + ki * err
    wk = pk + ik
    beta = jnp.clip(wk, 0.0, 1.0)
    return beta, jnp.stack([ik, wk, err])


class PIDControl:
    def __init__(self):
        self.i_k1 = 0.0
        self.w_k1 = 0.0
        self.e_k1 = 0.0

    @staticmethod
    def _kp_fun(err: float, scale: float = 1.0) -> float:
        # guard against overflow for large positive error
        if err > 60:
            return 0.0
        return 1.0 / (1.0 + scale * math.exp(err))

    def pid(
        self,
        exp_kl: float,
        kl_loss: float,
        kp: float = 0.01,
        ki: float = -0.0001,
        kd: float = 0.0,
    ) -> tuple[float, float]:
        """-> (beta in [0, 1], error)."""
        error_k = exp_kl - kl_loss
        pk = kp * self._kp_fun(error_k)
        ik = self.i_k1 + ki * error_k
        if self.w_k1 < 0 and self.w_k1 >= 1:  # reference's (dead) guard, :420-421
            ik = self.i_k1
        wk = pk + ik
        self.w_k1 = wk
        self.i_k1 = ik
        self.e_k1 = error_k
        return min(max(wk, 0.0), 1.0), error_k
