"""Per-device HBM map of the 512^2 stretch config across parallel layouts.

Single-chip measurements (tools/bench_ns512.py) pinned batch 2/chip as the
DP capacity (batch 4 OOMs at 18.4 GB). This tool answers "does spatial or
tensor parallelism lift the effective per-chip batch?" WITHOUT needing 8
real chips: the shipped trainer step is AOT-compiled against a virtual
v5e:2x4 TPU topology (jax.experimental.topologies — the backend compiler
runs for the real target, producing real per-device memory analyses and
the real GSPMD partitioning) for each layout:

  dp8          batch  8, P("data")           — 1 sample/chip
  dp8_b16      batch 16, P("data")           — 2 samples/chip (known fit)
  dp8_b24      batch 24, P("data")           — 3? (known single-chip OOM at 4)
  dp4_sp2      batch  8, ("data","x") 4x2    — 2 samples/chip, X sharded /2
  dp2_sp4      batch  8, ("data","x") 2x4    — 4 samples/chip, X sharded /4
  dp2_sp4_b16  batch 16, ("data","x") 2x4    — 8 samples/chip, X sharded /4
  dp4_tp2      batch  8, ("data","model") 4x2 — weights sharded
  dp8_b*_zero1 ZeRO-1: Adam moments sharded over "data" (parallel/zero.py)
               — the batch-24 row asks whether freeing ~2x params bytes of
               replicated moments per chip lifts the DP capacity to 3/chip

Run: python tools/bench_ns512_layouts.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NX, TW, T_RES = 512, 25, 101
GIB = 1 << 30


def build_trainer_aot():
    import jax

    import nps_tpu.models as models
    from nps_tpu.common.interfaces import D
    from nps_tpu.models.activations import GELUTanh, Tanh
    from nps_tpu.models.config import set_compute_dtype
    from nps_tpu.pde import PDE2D
    from nps_tpu.train.losses import build_criterion
    from nps_tpu.train.optim import build_optimizer
    from nps_tpu.train.pushforward import AutoregressivePushforwardTrainer

    set_compute_dtype("bfloat16")
    pde = PDE2D(tmin=0.0, tmax=10.0, nt=T_RES, L1=1.0, L2=1.0, nx1=NX,
                nx2=NX, x=None, name="ns512", n_cond_static=2,
                n_cond_dynamic=0, n_cond_spatial=2)
    model = models.activation_wrapper(
        model_class="EncProcDec", activation_final=Tanh(),
        enforce_spatial_cond=False, spatial_cond_channel=0,
        approx_volume_preserve=False,
        approx_volume_preserve_mode="individual_static", max_pct_dif=1 / TW,
        num_c=1, num_spatial_dims=2, time_window=TW, data_structure="grid",
        processor_residual=False, encoder="enc_grid.ElementWise",
        activation=GELUTanh(),  # cfg_ns512_ufno ships GELUTanh
        processor="UFNO", fno_modes=20, hidden_blocks=3,
        hidden_features=128, fno_kernel_size=1, fno_conv_mode="single",
        padding_mode="circular", ch_mults=[1, 1, 1],
        is_attn=[False, False, False], mid_attn=False, norm=True,
        use1x1=True, remat=True, remat_policy="save_conv_outputs",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step", pde=pde)

    class _D:
        pass

    data = _D()
    data.pde = pde
    data.data_interface = D.sim2d
    tr = AutoregressivePushforwardTrainer(
        model=model, data=data,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=None, time_window=TW, base_resolution=[T_RES, NX, NX],
        unrolling=1, lr_step_interval=25, nr_gt_steps=1,
        variable_time=False, device="default", batch_size=8)
    tr.tx, tr.base_lr = build_optimizer(object="optim.Adam", lr=1e-4)

    # abstract shapes for params/opt state (no device work)
    u0 = jax.ShapeDtypeStruct((1, 1, TW, NX, NX), np.float32)
    cond = jax.ShapeDtypeStruct((1, 2), np.float32)
    sc = jax.ShapeDtypeStruct((1, 2, NX, NX), np.float32)
    pos = jax.ShapeDtypeStruct((1, NX, NX, 2), np.float32)
    params_s = jax.eval_shape(
        lambda k, u, c, p, s: model.init(k, u, cond=c, bc=None, pos=p,
                                         t_cond=None, spatial_cond=s),
        jax.random.PRNGKey(0), u0, cond, pos, sc)
    opt_s = jax.eval_shape(tr.tx.init, params_s)
    return tr, model, params_s, opt_s


def main():
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nps_tpu.parallel.tensor import param_partition_specs

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    devs = np.array(topo.devices)
    tr, model, params_s, opt_s = build_trainer_aot()

    def sds(shape, dtype, mesh, spec):
        return jax.ShapeDtypeStruct(shape, dtype,
                                    sharding=NamedSharding(mesh, spec))

    def layout(name, batch, mesh_axes, mesh_shape, x_axis=None, tp=False,
               zero1=False):
        mesh = Mesh(devs.reshape(mesh_shape), mesh_axes)
        repl = lambda t: jax.tree_util.tree_map(
            lambda x: sds(x.shape, x.dtype, mesh, P()), t)
        if zero1:
            # ZeRO-1: params replicated, Adam moments sharded over "data"
            # (parallel/zero.py) — returns ~2x params bytes per chip.
            # The trainer must ALSO emit its in-step sharding constraints
            # (base._zero_shardings: grads reduce-scattered, update math
            # sharded) — input sharding alone measured WORSE than no ZeRO
            # (18.5 GB: the partitioner all-gathered the moments instead)
            from nps_tpu.parallel.zero import opt_state_specs

            tr.config.zero1 = True
            tr.mesh = mesh
            tr.params = params_s
            tr.opt_state = opt_s
            p_sh = repl(params_s)
            ospecs = opt_state_specs(opt_s, mesh)
            o_sh = jax.tree_util.tree_map(
                lambda x, s: sds(x.shape, x.dtype, mesh, s), opt_s, ospecs)
        elif tp:
            specs = param_partition_specs(params_s, mesh.shape["model"])
            p_sh = jax.tree_util.tree_map(
                lambda x, s: sds(x.shape, x.dtype, mesh, s), params_s, specs)
            # the REAL TP trainer shards the Adam state too (tx.init on
            # sharded params preserves their sharding) — replicating it
            # here overstated per-chip HBM by ~2x the params size and
            # could report a layout that actually fits as OOM. Adam's
            # mu/nu mirror param shapes; count/scalars replicate.
            shape_to_spec = {}
            for x, s in zip(jax.tree_util.tree_leaves(params_s),
                            jax.tree_util.tree_leaves(
                                specs, is_leaf=lambda v: isinstance(v, P))):
                shape_to_spec.setdefault((x.shape, x.dtype), s)
            o_sh = jax.tree_util.tree_map(
                lambda x: sds(x.shape, x.dtype, mesh,
                              shape_to_spec.get((x.shape, x.dtype), P())),
                opt_s)
        else:
            p_sh, o_sh = repl(params_s), repl(opt_s)
        u_spec = (P("data", None, None, x_axis, None) if x_axis
                  else P("data"))
        sc_spec = (P("data", None, x_axis, None) if x_axis else P("data"))
        pos_spec = (P("data", x_axis, None, None) if x_axis else P("data"))
        args = (
            p_sh, o_sh,
            sds((batch, 1, T_RES, NX, NX), np.float32, mesh, u_spec),
            sds((batch, NX, NX, 2), np.float32, mesh, pos_spec),
            sds((batch, 2), np.float32, mesh, P("data")),
            sds((batch, 0), np.float32, mesh, P()),
            sds((batch, 2, NX, NX), np.float32, mesh, sc_spec),
            sds((2,), np.uint32, mesh, P()),
        )
        fn = tr._make_train_step(1, batch, T_RES)
        if zero1:  # don't leak the zero1 wiring into later layouts
            tr.config.zero1 = False
            tr.mesh, tr.params, tr.opt_state = None, None, None
        try:
            compiled = fn.lower(*args).compile()
            ma = compiled.memory_analysis()
            temp = getattr(ma, "temp_size_in_bytes", None)
            argb = getattr(ma, "argument_size_in_bytes", None)
            out = dict(fit=True,
                       temp_gib=round(temp / GIB, 2) if temp else None,
                       args_gib=round(argb / GIB, 2) if argb else None)
        except Exception as e:
            msg = str(e)
            out = dict(fit=False, error=msg[:4000])
        print(f"{name:14s}: {out}", flush=True)
        return out

    # each 512^2 AOT compile takes tens of minutes on this 1-vCPU host, so
    # layouts are selectable by argv (default: the three decision-relevant
    # batch-16 layouts — same global batch, different slicing — plus the
    # known single-chip measurement as the cross-check)
    catalog = {
        "dp8": lambda: layout("dp8", 8, ("data",), (8,)),
        "dp8_b16": lambda: layout("dp8_b16", 16, ("data",), (8,)),
        "dp8_b24": lambda: layout("dp8_b24", 24, ("data",), (8,)),
        "dp4_sp2": lambda: layout("dp4_sp2", 8, ("data", "x"), (4, 2),
                                  x_axis="x"),
        "dp2_sp4": lambda: layout("dp2_sp4", 8, ("data", "x"), (2, 4),
                                  x_axis="x"),
        "dp2_sp4_b16": lambda: layout("dp2_sp4_b16", 16, ("data", "x"),
                                      (2, 4), x_axis="x"),
        "dp4_tp2": lambda: layout("dp4_tp2", 8, ("data", "model"), (4, 2),
                                  tp=True),
        "dp4_tp2_b16": lambda: layout("dp4_tp2_b16", 16, ("data", "model"),
                                      (4, 2), tp=True),
        "dp8_b16_zero1": lambda: layout("dp8_b16_zero1", 16, ("data",),
                                        (8,), zero1=True),
        "dp8_b24_zero1": lambda: layout("dp8_b24_zero1", 24, ("data",),
                                        (8,), zero1=True),
    }
    names = sys.argv[1:] or ["dp8_b16", "dp2_sp4_b16", "dp4_tp2_b16"]
    unknown = [n for n in names if n not in catalog]
    if unknown:
        sys.exit(f"unknown layout(s) {unknown}; choose from "
                 f"{sorted(catalog)}")
    results = {n: catalog[n]() for n in names}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
