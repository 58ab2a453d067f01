"""Physics step post-processing: BC extraction/injection and min clipping.

Parity: ``src/utils/process_output.py`` — re-expressed as pure functions
(``jnp.where`` masks instead of in-place tensor mutation) so they compose
with jit/scan on TPU.

Semantics preserved exactly:
- only DIV1D-named PDEs have active logic (``process_output.py:32-54``); all
  other PDEs (incl. the twophase "NS"-style datasets) pass through unchanged
  with ``bc=None``;
- ``process_settings`` can force ``set_bc`` / ``set_min`` off (``:26-30``).

Layout note: these operate on the reference's public layout
``[b, c, tw, *spatial]`` (they sit at trainer level, outside the
channels-last model interior).
"""

import jax.numpy as jnp

from nps_tpu.common.interfaces import M


def process_step(pde, model_interface, sim_prev, gtbc_prev, gtbc_next,
                 get_bc=True, set_bc=True, set_min=True, process_settings=None):
    """Returns (sim, bc). Pure; no device/state side effects."""
    if process_settings:
        if "set_bc" in process_settings:
            set_bc = set_bc and process_settings["set_bc"]
        if "set_min" in process_settings:
            set_min = set_min and process_settings["set_min"]

    # the GNN pipeline keeps data grid-shaped at trainer level (node
    # conversion happens at the model boundary), so the grid layout covers
    # both interfaces — but the reference's per-interface rules are kept:
    # set_bc applies only to AR_TB (process_output.py:33) and the GNN BC
    # signal never references the model output (:48-49)
    if f"{pde}" == "DIV1D" and model_interface in (M.AR_TB, M.AR_TB_GNN):
        if set_bc and model_interface == M.AR_TB:
            sim_prev = set_bc_1d(0, 0, sim_prev, gtbc_prev)
        if set_min:
            mu_ne, sd_ne = pde.var_mean_sd[0]
            mu_te, sd_te = pde.var_mean_sd[2]
            mu_nn, sd_nn = pde.var_mean_sd[3]
            min_dims = [0, 2, 3]
            min_values = [(0.1 - mu_ne) / sd_ne,
                          (0.1 - mu_te) / sd_te,
                          (0.1 - mu_nn) / sd_nn]
            sim_prev = set_min_values(min_dims, min_values, sim_prev)
        bc = None
        if get_bc:
            if model_interface == M.AR_TB:
                bc = extract_bc_1d(0, 0, sim_prev=sim_prev,
                                   gtbc_prev=gtbc_prev, gtbc_next=gtbc_next,
                                   mode=pde.bc_mode)
            else:
                bc = extract_bc_1d_simple(0, 0, gtbc_prev=gtbc_prev,
                                          gtbc_next=gtbc_next,
                                          mode=pde.bc_mode)
        return sim_prev, bc
    return sim_prev, None


def set_bc_1d(bc_dim, bc_x, sim, gtbc):
    """Overwrite boundary values of ``sim`` with ground-truth BCs.

    sim: [b, c, tw, nx]; bc_x in {0, -1}.
    """
    assert bc_x in (0, -1)
    return sim.at[:, bc_dim, :, bc_x].set(gtbc[:, bc_dim, :, bc_x])


def set_min_values(dims, min_values, sim):
    """Clamp the given channels from below (functional clip)."""
    for d, mv in zip(dims, min_values):
        sim = sim.at[:, d].set(jnp.maximum(sim[:, d], mv))
    return sim


def extract_bc_1d(bc_dim, bc_x, sim_prev, gtbc_prev, gtbc_next, mode="delta"):
    """Extract BC signal [b, n_bc, tw] from sim/ground-truth boundaries."""
    assert bc_x in (0, -1)
    tw = sim_prev.shape[2]

    boundary_prev = sim_prev[:, bc_dim, :, bc_x]   # [b, tw]
    bc_prev = gtbc_prev[:, bc_dim, :, bc_x]
    bc_next = gtbc_next[:, bc_dim, :, bc_x]

    boundary_last = jnp.repeat(boundary_prev[:, -1:], tw, axis=1)
    dif_new = bc_next - boundary_last
    dif_prev = bc_prev - boundary_last
    if mode == "delta":
        return jnp.stack([dif_new, dif_prev], axis=1)
    if mode == "all_fixed_bc":
        return jnp.stack([boundary_prev, bc_next, dif_new], axis=1)
    if mode == "all":
        return jnp.stack([boundary_prev, bc_prev, bc_next, dif_new, dif_prev], axis=1)
    if mode == "simple":
        return jnp.stack([bc_prev, bc_next], axis=1)
    raise ValueError("Incorrect BC mode")


def extract_bc_1d_simple(bc_dim, bc_x, gtbc_prev, gtbc_next, mode="delta"):
    """BC extraction that does not reference the model output."""
    assert bc_x in (0, -1)
    tw = gtbc_prev.shape[2]
    bc_prev = gtbc_prev[:, bc_dim, :, bc_x]
    bc_next = gtbc_next[:, bc_dim, :, bc_x]
    boundary_last = jnp.repeat(bc_prev[:, -1:], tw, axis=1)
    dif_new = bc_next - boundary_last
    dif_prev = bc_prev - boundary_last
    if mode == "delta":
        return jnp.stack([dif_new, dif_prev], axis=1)
    if mode == "simple":
        return jnp.stack([bc_prev, bc_next], axis=1)
    raise ValueError("Incorrect BC mode")
