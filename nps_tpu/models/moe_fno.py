"""Mixture-of-Spectral-Experts FNO processor (beyond reference).

The reference has no mixture-of-experts model anywhere
(``/root/reference/src/models`` — SURVEY.md §2.6 lists expert parallelism
as a non-goal for that reason). This processor adds the missing expert
dimension as a *useful* extension rather than a sham: PDE surrogates are
trained across conditioning regimes (viscosities, inflow rates, boundary
settings — ``cfg_twophase_*`` condition on 2 static + spatial parameters),
and a conditioning-gated mixture of spectral operators lets each expert
specialise to a regime while sharing the rest of the network.

Design — the TPU-idiomatic MoE:
- **Soft (dense) mixture**: every expert runs on every sample and the gate
  combines them: ``y[b] = act(sum_e g[b,e] * Expert_e(x)[b])``. No top-k
  dispatch, no capacity factors, no dynamic shapes — everything is a
  static-shape einsum XLA can tile onto the MXU. At the E this model
  targets (2-8 spectral experts) dense compute is cheaper than the
  all-to-all a sparse MoE would need.
- **Experts as a vmapped leading axis**: ``nn.vmap`` over ``FNO_Layer``
  stacks each expert's weights on a leading ``E`` axis. That axis is the
  natural *expert-parallel* sharding target: place those leaves with
  ``PartitionSpec('expert', ...)`` on a ("data", "expert") mesh and GSPMD
  partitions the expert compute across devices and turns the gate
  contraction into a psum over the 'expert' axis
  (``nps_tpu.parallel.expert``).
- **Gate**: softmax Dense on the model-level conditioning vector
  (``variables``); when the model has no conditioning the gate falls back
  to a global-average-pooled summary of the hidden state.

With ``n_experts=1`` the block reduces exactly to ``FNO_Layer`` (the
softmax gate is the constant 1), which the tests exploit for parity.
"""

from typing import Any, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.common.interfaces import D, M
from nps_tpu.models.activations import resolve_activation
from nps_tpu.models.fno import FNO_Layer


class MoEFNO(nn.Module):
    """``hidden_blocks`` x (gated mixture of ``n_experts`` FNO layers)."""

    model_interface = M.AR_TB
    data_interface = (D.sim1d, D.sim1d_var_t, D.sim2d)

    pde: Any = None
    num_spatial_dims: int = 1
    n_cond: int = 0
    hidden_features: int = 128
    hidden_blocks: int = 4
    cond_mode: str = "concat"
    padding_mode: str = "circular"
    activation: Any = "gelu"

    n_experts: int = 4
    fno_modes: Union[int, Sequence[int]] = 48
    fno_kernel_size: int = 1
    fno_conv_mode: str = "single"
    mix_impl: str = "dft"
    remat: bool = False
    remat_policy: Any = None

    @nn.compact
    def __call__(self, h, variables=None, variables_broadcast=None,
                 pos=None):
        assert self.cond_mode in ("concat", None), \
            "MoEFNO conditions by concat (+ the gate); FiLM is not supported"
        act = resolve_activation(self.activation)
        E = int(self.n_experts)
        hidden_in = (self.hidden_features + self.n_cond
                     if self.cond_mode == "concat" else self.hidden_features)
        pm = self.padding_mode if self.padding_mode != "ones" else "zeros"

        from nps_tpu.models.common import resolve_remat_policy

        policy = resolve_remat_policy(self.remat_policy)
        base_cls = (nn.remat(FNO_Layer, policy=policy) if self.remat
                    else FNO_Layer)
        # experts: FNO_Layer vmapped over a leading E axis of its params
        # (in_axes=None broadcasts the input to every expert; out_axes=0
        # stacks expert outputs [E, b, *sp, C])
        ExpertCls = nn.vmap(
            base_cls, in_axes=None, out_axes=0,
            variable_axes={"params": 0}, split_rngs={"params": True},
            axis_size=E)

        for i in range(self.hidden_blocks):
            h_in = (jnp.concatenate([h, variables_broadcast], axis=-1)
                    if (self.cond_mode == "concat"
                        and variables_broadcast is not None) else h)

            # ---- gate [b, E] ----
            if variables is not None:
                gate_in = variables
            else:
                # no conditioning: gate on a pooled summary of the state
                gate_in = jnp.mean(h, axis=tuple(
                    range(1, 1 + self.num_spatial_dims)))
            logits = nn.Dense(E, name=f"gate_{i}")(gate_in)
            g = nn.softmax(logits.astype(jnp.float32), axis=-1)

            # ---- experts [E, b, *sp, C] (activation applied AFTER the
            #      mixture so the mixed operator stays linear in experts;
            #      for E=1 this equals FNO_Layer's own post-activation) ----
            outs = ExpertCls(
                hidden_dim=hidden_in, hidden_dim_out=self.hidden_features,
                num_spatial_dims=self.num_spatial_dims, modes=self.fno_modes,
                kernel_size=self.fno_kernel_size,
                conv_mode=self.fno_conv_mode, padding_mode=pm,
                activation=None, mix_impl=self.mix_impl,
                name=f"experts_{i}")(h_in)

            # contract the expert axis with the gate; under expert
            # parallelism GSPMD lowers this to a psum over 'expert'
            g_bc = jnp.moveaxis(g, -1, 0).astype(outs.dtype)  # [E, b]
            g_bc = g_bc.reshape(g_bc.shape + (1,) * (outs.ndim - 2))
            h = act(jnp.sum(outs * g_bc, axis=0))
        return h
