"""Host-side PI controller producing the KL weight beta (MAGE+ auto-beta).

Semantics parity with the reference PIDControl (modules/mage_model.py:394-434):
P term ``Kp / (1 + exp(err))``, integral accumulation with the (vestigial)
anti-windup guard, output clamped to [0, 1]. Lives on the host — the train
step stays pure and takes beta as a scalar argument (SURVEY.md §7 hard-part
5); beta therefore applies with a one-step delay relative to the KL it was
computed from (the reference reads kl.item() synchronously mid-forward,
:629 — an implicit device sync the TPU path avoids).
"""

from __future__ import annotations

import math


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
