"""PI controller producing the KL weight beta (MAGE+ auto-beta).

Semantics parity with the reference PIDControl (modules/mage_model.py:394-434):
P term ``Kp / (1 + exp(err))``, integral accumulation, output clamped to
[0, 1]. The reference's anti-windup guard is dead code (``w_k1 < 0 and
w_k1 >= 1``); both implementations here default to a WORKING directional
anti-windup (see ``pid_update``) because the broken guard measurably kept
beta at 0 for entire training runs; ``anti_windup=False`` restores the
reference-exact behavior.

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
    anti_windup: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """One controller step -> (beta in [0, 1], new [i_k1, w_k1, e_k1]).

    The math of ``PIDControl.pid`` below (itself matching the reference
    mage_model.py:406-434), traceable under jit.

    ``anti_windup`` (default on) fixes the reference controller's broken
    integral guard: the reference writes ``if w_k1 < 0 and w_k1 >= 1``
    (mage_model.py:420-421) — vacuously false, so the integral is never
    clamped. Measured failure (VERDICT r3): training that starts with KL
    near zero (err = target - kl large positive, ki negative) winds i_k
    deep negative while beta is already saturated at 0; when KL later
    overshoots the target the integral needs thousands of steps to crawl
    back, so beta sat at 0 for entire runs (cater_kl 40 epochs, klp_hv 15
    epochs) and the posterior trained unconstrained. The fix is textbook
    conditional integration: freeze the integral only when the update
    would push FURTHER into saturation (w_k1 <= 0 with a negative delta,
    or w_k1 >= 1 with a positive delta); updates that move the output
    back toward the [0, 1] band always pass. ``anti_windup=False`` is the
    reference-exact (broken-guard) behavior, kept for parity tests."""
    i_k1, w_k1 = pid_state[0], pid_state[1]
    err = jnp.float32(exp_kl) - jnp.asarray(kl_loss, jnp.float32)
    # Kp / (1 + exp(err)); the reference guards err > 60 against overflow
    pk = kp * jnp.where(
        err > 60.0, 0.0, 1.0 / (1.0 + jnp.exp(jnp.minimum(err, 60.0)))
    )
    delta = ki * err
    if anti_windup:
        freeze = ((w_k1 <= 0.0) & (delta < 0.0)) | (
            (w_k1 >= 1.0) & (delta > 0.0)
        )
        ik = jnp.where(freeze, i_k1, i_k1 + delta)
    else:
        ik = i_k1 + delta
    wk = pk + ik
    beta = jnp.clip(wk, 0.0, 1.0)
    return beta, jnp.stack([ik, wk, err])


class PIDControl:
    def __init__(self, anti_windup: bool = True):
        self.i_k1 = 0.0
        self.w_k1 = 0.0
        self.e_k1 = 0.0
        self.anti_windup = anti_windup

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
        delta = ki * error_k
        ik = self.i_k1 + delta
        if self.anti_windup:
            # directional conditional integration (see pid_update)
            if (self.w_k1 <= 0 and delta < 0) or (self.w_k1 >= 1 and delta > 0):
                ik = self.i_k1
        elif self.w_k1 < 0 and self.w_k1 >= 1:  # reference's dead guard, :420-421
            ik = self.i_k1
        wk = pk + ik
        self.w_k1 = wk
        self.i_k1 = ik
        self.e_k1 = error_k
        return min(max(wk, 0.0), 1.0), error_k
