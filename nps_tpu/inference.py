"""Standalone inference/serving API.

The reference has no inference entry point (rollouts only happen inside the
trainer; checkpoints are loaded by external notebooks —
``src/train.py:22,33-34``). This module makes deployment first-class: build
a surrogate from a config file, load a checkpoint (nps_tpu msgpack or a
PyTorch reference ``.pt``), and run jitted scan-based rollouts.

    from nps_tpu.inference import SurrogateEngine
    eng = SurrogateEngine.from_config(
        "nps_tpu/configs/train/cfg_twophase_ufno.py",
        checkpoint="experiments/run_default.msgpack",
        overrides=["--trainer.base_resolution=[501,96,64]"],
        pde=my_pde)                       # or a dataset to derive it from
    frames = eng.rollout(u0, cond=cond, spatial_cond=sc, n_steps=19)
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
import flax.serialization

import nps_tpu.models as models
from nps_tpu.configs.parse import parse_args
from nps_tpu.pde import PDE2D


class SurrogateEngine:
    def __init__(self, model, params, pde, time_window, neighbors=3):
        from nps_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()  # serving restarts skip rollout recompiles
        self.model = model
        self.params = params
        self.pde = pde
        self.tw = time_window
        self.neighbors = neighbors  # GNN edge rule (trainer.neighbors)
        self.mesh = None
        self._rollout_cache = {}
        self._graph_cache = {}

    # ------------------------------------------------------------------
    def shard(self, spatial_parallel=0, devices=None):
        """Distribute serving over the local device mesh.

        ``spatial_parallel=0`` → 1-D ("data",) mesh: rollout batches shard
        on their leading axis, params replicate, XLA partitions the jitted
        scan SPMD (pure throughput scaling). ``spatial_parallel=K`` → 2-D
        ("data", "x") grid mesh: the first spatial dim additionally shards
        over "x" and GSPMD inserts the halo exchanges / spectral psums —
        the serving path for fields too large for one chip (the 512²-class
        configs). Mirrors the trainer's mesh regimes
        (``nps_tpu/parallel/mesh.py``); equality with single-device serving
        is pinned by ``tests/test_inference.py``.
        """
        if self._is_gnn():
            raise NotImplementedError(
                "mesh serving supports grid models; the GNN graph is "
                "batch-size-specialized")
        from nps_tpu.parallel.mesh import (make_grid_mesh, make_mesh,
                                           replicate)

        if spatial_parallel and spatial_parallel > 1:
            self.mesh = make_grid_mesh(spatial_parallel, devices)
        else:
            self.mesh = make_mesh(devices)
        if self.params is not None:
            self.params = replicate(self.params, self.mesh)
        self._rollout_cache.clear()
        return self

    def _place_inputs(self, u, cond, pos, spatial_cond):
        """Commit serving inputs with the mesh sharding; jit then runs the
        rollout SPMD from the input placements (GSPMD propagation — same
        mechanism the trainer uses)."""
        from jax.sharding import NamedSharding

        mesh = self.mesh
        n_data = int(dict(mesh.shape)["data"])
        if int(u.shape[0]) % n_data != 0:
            raise ValueError(
                f"serving batch {u.shape[0]} must divide the mesh's data "
                f"extent {n_data} (pad the batch or reshape the mesh)")
        has_x = "x" in dict(mesh.shape)

        def put(a, spec):
            return jax.device_put(a, NamedSharding(mesh, spec))

        u = put(u, P("data", None, None, "x")
                if has_x and u.ndim == 5 else P("data"))
        pos = put(pos, P("data", "x") if has_x and pos.ndim == 4
                  else P("data"))
        if cond is not None:
            cond = put(cond, P("data"))
        if spatial_cond is not None:
            spatial_cond = put(spatial_cond,
                               P("data", None, "x")
                               if has_x and spatial_cond.ndim == 4
                               else P("data"))
        return u, cond, pos, spatial_cond

    def _is_gnn(self):
        from nps_tpu.common.interfaces import M

        return self.model.model_interface == M.AR_TB_GNN

    def _ensure_graph(self, batch_size):
        """Host-side static graph structure for GNN models (built once per
        batch size; closed over as constants by the jitted rollout)."""
        key = int(batch_size)
        if key not in self._graph_cache:
            from nps_tpu.common import graph as G

            self._graph_cache[key] = G.build_static_structure(
                self.pde, self.pde.x, self.neighbors, key)
        return self._graph_cache[key]

    def _apply(self, params, u, cond, pos, spatial_cond):
        """Model apply with grid<->node conversion for GNN models."""
        if self._is_gnn():
            from nps_tpu.common import graph as G

            b, sp = u.shape[0], u.shape[3:]
            edges, pos_n, batch, meta = self._graph_cache[int(b)]
            g = G.GridGraph(nodes=G.grid_to_nodes(u), edge_index=edges,
                            pos=pos_n, batch=batch)
            out = self.model.apply(params, g, cond=cond, pos=pos,
                                   spatial_cond=spatial_cond, grid_meta=meta)
            return G.nodes_to_grid(out, b, sp)
        return self.model.apply(params, u, cond=cond, pos=pos,
                                spatial_cond=spatial_cond)

    # ------------------------------------------------------------------
    @classmethod
    def from_config(cls, config_file, checkpoint=None, overrides=(),
                    pde=None, dataset=None, compute_dtype=None):
        """Build from a training config file (same override semantics as the
        CLI). The PDE metadata comes from ``pde`` or ``dataset.pde``."""
        argv = sys.argv
        try:
            sys.argv = ["inference", "-C", config_file, *overrides]
            args = parse_args()
        finally:
            sys.argv = argv

        if compute_dtype or args["trainer"].get("compute_dtype"):
            from nps_tpu.models.config import set_compute_dtype

            set_compute_dtype(compute_dtype or
                              args["trainer"]["compute_dtype"])

        if pde is None:
            if dataset is not None:
                pde = dataset.pde
            else:
                t_res, nx1, nx2 = args["trainer"]["base_resolution"]
                pde = PDE2D(tmin=0.0, tmax=1.0, nt=t_res, L1=1.0,
                            L2=nx2 / nx1, nx1=nx1, nx2=nx2, x=None,
                            name=args["dataset"].get("name", "pde"),
                            n_cond_static=args.get("n_cond_static", 0),
                            n_cond_spatial=args.get("n_cond_spatial", 0))

        model_args = dict(args["model"])
        obj = model_args.pop("object", "activation_wrapper")
        model = getattr(models, obj)(**model_args, pde=pde)
        eng = cls(model, None, pde, args["trainer"]["time_window"],
                  neighbors=args["trainer"].get("neighbors", 3))
        if checkpoint is not None:
            eng.load(checkpoint)
        return eng

    # ------------------------------------------------------------------
    def init_params(self, u0, cond=None, spatial_cond=None, seed=0):
        pos = self._pos(u0.shape[0])
        u_in = jnp.asarray(u0)
        if self._is_gnn():
            from nps_tpu.common import graph as G

            self._ensure_graph(u0.shape[0])
            edges, pos_n, batch, _ = self._graph_cache[int(u0.shape[0])]
            u_in = G.GridGraph(nodes=G.grid_to_nodes(u_in), edge_index=edges,
                               pos=pos_n, batch=batch)
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed), u_in,
            cond=_maybe(cond), bc=None, pos=pos, t_cond=None,
            spatial_cond=_maybe(spatial_cond))
        if self.mesh is not None:
            from nps_tpu.parallel.mesh import replicate

            self.params = replicate(self.params, self.mesh)
        return self.params

    def load(self, path):
        """Load an nps_tpu ``.msgpack`` export or a torch reference ``.pt``."""
        if path.endswith(".pt") or path.endswith(".pth"):
            from nps_tpu.compat import load_torch_checkpoint

            self.params = load_torch_checkpoint(path)
        else:
            with open(path, "rb") as f:
                data = f.read()
            self.params = flax.serialization.msgpack_restore(data)
        if self.mesh is not None:
            from nps_tpu.parallel.mesh import replicate

            self.params = replicate(self.params, self.mesh)
        return self

    # ------------------------------------------------------------------
    def _pos(self, batch):
        x = np.asarray(self.pde.x, np.float32)
        return jnp.asarray(np.broadcast_to(x[None], (batch,) + x.shape))

    def _get_rollout_fn(self, n_steps, shape_key):
        key = (n_steps, shape_key)
        if key not in self._rollout_cache:
            apply = self._apply

            @jax.jit
            def fn(params, u0, cond, pos, spatial_cond):
                def body(pred, _):
                    pred = apply(params, pred, cond, pos, spatial_cond)
                    return pred, pred

                _, frames = jax.lax.scan(body, u0, None, length=n_steps)
                return frames  # [n_steps, b, c, tw, *sp]

            self._rollout_cache[key] = fn
        return self._rollout_cache[key]

    def step(self, u, cond=None, spatial_cond=None):
        """One bundled step: [b, c, tw, *sp] -> next tw frames.

        Served through the same jit cache as ``rollout`` (an n_steps=1
        scan) — a frame-by-frame serving loop must not pay per-call
        tracing/eager-dispatch overhead."""
        u = jnp.asarray(np.asarray(u, np.float32))
        pos = self._pos(u.shape[0])
        if self._is_gnn():
            self._ensure_graph(u.shape[0])
        cond, spatial_cond = _maybe(cond), _maybe(spatial_cond)
        if self.mesh is not None:
            u, cond, pos, spatial_cond = self._place_inputs(
                u, cond, pos, spatial_cond)
        fn = self._get_rollout_fn(1, (u.shape, u.dtype.name))
        frames = fn(self.params, u, cond, pos, spatial_cond)
        return np.asarray(frames[0])

    def rollout(self, u0, n_steps, cond=None, spatial_cond=None,
                include_init=False):
        """Autoregressive rollout from a [b, c, tw, *sp] seed window.

        Returns [b, c, n_steps*tw(+tw), *sp] predicted frames.
        """
        assert self.params is not None, "load() or init_params() first"
        u0 = jnp.asarray(np.asarray(u0, np.float32))
        pos = self._pos(u0.shape[0])
        if self._is_gnn():
            self._ensure_graph(u0.shape[0])
        cond, spatial_cond = _maybe(cond), _maybe(spatial_cond)
        if self.mesh is not None:
            u0, cond, pos, spatial_cond = self._place_inputs(
                u0, cond, pos, spatial_cond)
        fn = self._get_rollout_fn(n_steps, (u0.shape, u0.dtype.name))
        frames = fn(self.params, u0, cond, pos, spatial_cond)
        frames = np.asarray(frames)  # [n_steps, b, c, tw, *sp]
        frames = np.moveaxis(frames, 0, 2)
        out = frames.reshape(frames.shape[:2] + (-1,) + frames.shape[4:])
        if include_init:
            out = np.concatenate([np.asarray(u0), out], axis=2)
        return out


    # ------------------------------------------------------------------
    # AOT serving artifact (jax.export / StableHLO)
    # ------------------------------------------------------------------
    _NPSX_MAGIC = b"NPSX0001"

    def export_rollout(self, path, n_steps, example_u0, cond=None,
                       spatial_cond=None, platforms=("cpu", "tpu"),
                       batch_poly=True, disable_platform_check=False):
        """AOT-export the jitted ``n_steps`` rollout as a self-contained
        StableHLO artifact (``jax.export``): parameters and the position
        grid are baked in as constants, so the file serves WITHOUT the
        model code, config system, or checkpoint — deserialize and call.

        The artifact is multi-platform (default cpu+tpu: lowering is
        platform-parametric, no TPU needed at export time) and, with
        ``batch_poly=True``, batch-size polymorphic via a symbolic leading
        dimension. Reload with :func:`load_exported`.

        The reference has no serving story at all (checkpoints are consumed
        by external notebooks, ``src/train.py:22``); this is the TPU-native
        production counterpart: one immutable artifact per deployed model,
        versioned by jax.export's calling convention.
        """
        import json

        from jax import export as jex

        assert self.params is not None, "load() or init_params() first"
        if self._is_gnn():
            raise NotImplementedError(
                "export_rollout supports grid models; the GNN rollout "
                "closes over a batch-size-specialized static graph")
        u0 = jnp.asarray(np.asarray(example_u0, np.float32))
        cond = _maybe(cond)
        spatial_cond = _maybe(spatial_cond)
        params = self.params
        pos1 = jnp.asarray(np.asarray(self.pde.x, np.float32))
        apply = self._apply

        has_cond = cond is not None
        has_sc = spatial_cond is not None

        def fn(*args):
            u, rest = args[0], list(args[1:])
            c = rest.pop(0) if has_cond else None
            sc = rest.pop(0) if has_sc else None
            pos = jnp.broadcast_to(pos1[None],
                                   (u.shape[0],) + pos1.shape)

            def body(pred, _):
                pred = apply(params, pred, c, pos, sc)
                return pred, pred

            _, frames = jax.lax.scan(body, u, None, length=n_steps)
            return frames  # [n_steps, b, c, tw, *sp]

        if batch_poly:
            (b,) = jex.symbolic_shape("b")
        else:
            b = int(u0.shape[0])
        specs = [jax.ShapeDtypeStruct((b,) + u0.shape[1:], u0.dtype)]
        if has_cond:
            specs.append(jax.ShapeDtypeStruct((b,) + cond.shape[1:],
                                              cond.dtype))
        if has_sc:
            specs.append(jax.ShapeDtypeStruct((b,) + spatial_cond.shape[1:],
                                              spatial_cond.dtype))
        disabled = ((jex.DisabledSafetyCheck.platform(),)
                    if disable_platform_check else ())
        exported = jex.export(jax.jit(fn), platforms=list(platforms),
                              disabled_checks=disabled)(*specs)
        payload = exported.serialize()
        header = json.dumps({
            "n_steps": int(n_steps),
            "time_window": int(self.tw),
            "has_cond": has_cond,
            "has_spatial_cond": has_sc,
            "u0_shape": ["b" if batch_poly else int(u0.shape[0]),
                         *map(int, u0.shape[1:])],
            "pde_name": getattr(self.pde, "name", ""),
            "platforms": list(platforms),
        }).encode()
        with open(path, "wb") as f:
            f.write(self._NPSX_MAGIC)
            f.write(len(header).to_bytes(8, "little"))
            f.write(header)
            f.write(payload)
        return path


class ExportedSurrogate:
    """A deserialized serving artifact (see ``SurrogateEngine.export_rollout``).

    Self-contained: params and position grid are constants inside the
    StableHLO module; only the seed window (and the conditioning the model
    was exported with) are inputs.
    """

    def __init__(self, exported, meta):
        self._exported = exported
        self.meta = meta
        self.tw = int(meta["time_window"])
        self.n_steps = int(meta["n_steps"])

    def rollout(self, u0, cond=None, spatial_cond=None, include_init=False):
        """[b, c, tw, *sp] seed -> [b, c, n_steps*tw(+tw), *sp] frames."""
        u0 = jnp.asarray(np.asarray(u0, np.float32))
        args = [u0]
        for name, val in (("has_cond", cond),
                          ("has_spatial_cond", spatial_cond)):
            if self.meta[name]:
                if val is None:
                    raise ValueError(
                        f"artifact was exported with {name[4:]}; pass it")
                args.append(jnp.asarray(np.asarray(val, np.float32)))
            elif val is not None:
                raise ValueError(
                    f"artifact was exported without {name[4:]}")
        frames = np.asarray(self._exported.call(*args))
        frames = np.moveaxis(frames, 0, 2)  # [b, c, n_steps, tw, *sp]
        out = frames.reshape(frames.shape[:2] + (-1,) + frames.shape[4:])
        if include_init:
            out = np.concatenate([np.asarray(u0), out], axis=2)
        return out


def load_exported(path):
    """Load a ``SurrogateEngine.export_rollout`` artifact for serving."""
    import json

    from jax import export as jex

    with open(path, "rb") as f:
        data = f.read()
    magic = SurrogateEngine._NPSX_MAGIC
    if data[:len(magic)] != magic:
        raise ValueError(f"{path} is not an nps_tpu export artifact")
    off = len(magic)
    hlen = int.from_bytes(data[off:off + 8], "little")
    off += 8
    meta = json.loads(data[off:off + hlen].decode())
    exported = jex.deserialize(data[off + hlen:])
    return ExportedSurrogate(exported, meta)


def _maybe(x):
    if x is None:
        return None
    x = jnp.asarray(np.asarray(x, np.float32))
    return None if x.size == 0 else x
