"""Autoregressive pushforward trainer — the concrete training strategy.

Capability parity with ``src/trainers/autoregressivepushforwardtrainer.py``:

- **train_step** (pushforward, extended from MP-Neural-PDE-Solvers): unroll
  depth ramps with ``epoch // lr_step_interval`` capped at
  ``config.unrolling`` then uniform-random per step (``:78-82``); a random
  start step per batch element (``:95``); ``unrolled`` no-grad model steps
  feeding predictions back as inputs with BC extraction / injection /
  min-clipping between steps (``:115-144``); one final grad-tracked step;
  loss = sqrt(sum-MSE) (``:162``).
- **test_step**: one-step losses at every tw-strided start plus unrolled
  full-trajectory losses (normalized by spatial cell count and rollout
  length) and numerical-baseline comparison (``:165-286,442-514``).
- **simulate**: the inference API — rollout from ``nr_gt_steps*tw``
  ground-truth frames to ``t_res`` in tw-strided steps, with optional BC
  injection from ``u_bc``, min clipping, loss and data collection
  (``:288-440``).

TPU-native design (not a translation):
- the no-grad pushforward unroll is a ``lax.scan`` under ``stop_gradient``
  (body compiled once regardless of depth);
- ``simulate`` is a single ``lax.scan`` over the rollout with the prediction
  window as the donated carry;
- per-element random start steps are a vmapped ``dynamic_slice`` with traced
  offsets drawn from ``jax.random``;
- everything is jitted per static (unroll depth, batch size, t_res) and
  cached; (params, opt_state) are donated so the optimizer updates in
  place in HBM.
"""

import math
import threading

import numpy as np
import jax
import jax.numpy as jnp

from nps_tpu.common.interfaces import D, M
from nps_tpu.train.base import TrainInterface
from nps_tpu.utils.process_output import process_step

import random as py_random


def window(u, steps, tw, mode):
    """Per-element time windows via vmapped dynamic_slice.

    u: [b, c, t, *sp]; steps: [b] int32. mode 'data' -> [step-tw, step),
    'labels' -> [step, step+tw), 'both' -> both (one 2*tw slice, split).
    Parity: ``common/data_creator.py:48-78``.
    """
    if mode == "both":
        sl = jax.vmap(lambda ui, s: jax.lax.dynamic_slice_in_dim(
            ui, s - tw, 2 * tw, axis=1))(u, steps)
        return sl[:, :, :tw], sl[:, :, tw:]
    if mode == "data":
        return jax.vmap(lambda ui, s: jax.lax.dynamic_slice_in_dim(
            ui, s - tw, tw, axis=1))(u, steps)
    if mode == "labels":
        return jax.vmap(lambda ui, s: jax.lax.dynamic_slice_in_dim(
            ui, s, tw, axis=1))(u, steps)
    raise ValueError(mode)


def _opt(x):
    """None-ify empty placeholder arrays ([b, 0] / size-0)."""
    return None if (x is None or x.size == 0) else x


def _frames(seq):
    """[n_steps, b, c, tw, *sp] scan output -> [b, c, n_steps*tw, *sp]."""
    seq = np.asarray(seq)
    seq = np.moveaxis(seq, 0, 2)  # [b, c, n_steps, tw, *sp]
    return seq.reshape(seq.shape[:2] + (-1,) + seq.shape[4:])


class AutoregressivePushforwardTrainer(TrainInterface):
    data_interface = [D.sim1d, D.sim2d, D.sim1d_var_t]
    model_interface = [M.AR_TB, M.AR_TB_GNN]

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        config = self.config
        self.tw = config.time_window
        self.t_res = config.base_resolution[0]
        if not hasattr(self.config, "process_settings"):
            self.config.process_settings = {}
        self._jit_cache = {}
        # graph-format processing for GNN models (parity:
        # autoregressivepushforwardtrainer.py:30-37); also the static
        # edge-structure cache for the jitted GNN path
        from nps_tpu.common.data_creator import DataCreator

        self.data_creator = DataCreator(
            pde=self.data.pde,
            neighbors=getattr(config, "neighbors", 3),
            time_window=config.time_window,
            t_resolution=config.base_resolution[0],
            x_resolution=config.base_resolution[1])
        self._graph_cache = {}
        self._graph_hash = {}
        self._pp_apply = None
        # background compile-ahead of the unroll ramp's future depths
        # (see _maybe_precompile_ahead)
        self._precompile_thread = None
        self._precompiled_depths = set()
        self._compile_gate = threading.Lock()
        self._compile_locks = {}

    def _key_lock(self, key):
        """Per-jit-key lock so the compile-ahead worker and the training
        thread never race two compiles of the same step function."""
        with self._compile_gate:
            return self._compile_locks.setdefault(key, threading.Lock())

    def _on_state_rebuilt(self):
        self._jit_cache = {}
        # the warmed jitted fns are gone with the cache; let a fresh
        # worker re-warm (the persistent XLA cache keeps it cheap)
        self._precompiled_depths = set()
        self._precompile_thread = None

    # ------------------------------------------------------------------
    # compile-ahead of the unroll ramp
    # ------------------------------------------------------------------
    def _maybe_precompile_ahead(self, args):
        """Overlap the unroll ramp's future train-step compiles with
        training. Each new pushforward depth is a new ``lax.scan`` length
        -> a fresh XLA compile; on a remote compiler (axon tunnel) those
        measured 200-350 s EACH and accounted for ~half the wall clock of
        a first-time 500-epoch convergence run (BASELINE.md "Trained to
        convergence", per-phase decomposition). A daemon worker lowers +
        compiles depths 1..unrolling from abstract args while the chip
        trains depth-0 epochs, so the backend compile is a warm cache hit
        by the time the ramp first needs it. Pure warm-up: the worker
        touches no training state and failures only cost the overlap.

        The reference recompiles nothing (eager torch); this is a
        TPU-native concern with no upstream counterpart.
        """
        if self._precompile_thread is not None:
            return
        if self._use_dynamic_unroll():
            # the depth-generic step compiles ONCE for all depths; there is
            # nothing to warm (this worker's measured overlap ceiling at
            # fresh shapes was ~35% anyway — BASELINE.md)
            return
        if not getattr(self.config, "precompile_ahead", True):
            return
        unrolling = int(getattr(self.config, "unrolling", 0) or 0)
        if unrolling <= 0 or self._is_gnn():
            return
        tw, t_res = self.tw, int(args[0].shape[2])
        batch_size = int(args[0].shape[0])

        mesh = getattr(self, "mesh", None) or getattr(
            getattr(self, "sharding", None), "mesh", None)

        def abstract(a):
            if a is None or not hasattr(a, "shape"):
                return a
            sharding = getattr(a, "sharding", None)
            if mesh is not None and not isinstance(
                    sharding, jax.sharding.NamedSharding):
                # an uncommitted single-device leaf (the PRNG key, host
                # scalars): inline dispatch is free to move it onto the
                # mesh, but freezing its SingleDeviceSharding into the AOT
                # lowering makes XLA reject the mixed device sets. Leave
                # the sharding unspecified and let lowering place it the
                # way inline dispatch would.
                sharding = None
            try:
                return jax.ShapeDtypeStruct(a.shape, a.dtype,
                                            sharding=sharding)
            except TypeError:  # older signature without sharding kwarg
                return jax.ShapeDtypeStruct(a.shape, a.dtype)

        abs_args = jax.tree_util.tree_map(
            abstract, (self.params, self.opt_state) + tuple(args),
            is_leaf=lambda x: x is None)
        # only depths the trajectory admits (mirrors _make_train_step's
        # guard) and that the ramp will actually reach
        depths = [d for d in range(1, unrolling + 1)
                  if t_res - tw - tw * d + 1 > tw]

        def worker():
            import warnings as _w

            for d in depths:
                try:
                    key = ("train", d, batch_size, t_res)
                    with self._key_lock(key):
                        if d in self._precompiled_depths:
                            continue
                        fn = self._jit(
                            key,
                            lambda d=d: self._make_train_step(d, batch_size,
                                                              t_res))
                        from nps_tpu.utils.retry import with_compile_retry

                        with_compile_retry(
                            lambda: fn.lower(*abs_args).compile(), retries=1)
                        self._precompiled_depths.add(d)
                except Exception as e:  # warm-up only: never fail training
                    _w.warn(f"compile-ahead of unroll depth {d} failed "
                            f"({e}); the ramp will compile it inline")
                    return

        self._precompile_thread = threading.Thread(target=worker,
                                                   daemon=True)
        self._precompile_thread.start()

    # ------------------------------------------------------------------
    # jitted step builders
    # ------------------------------------------------------------------
    def _is_gnn(self):
        return self.model.model_interface == M.AR_TB_GNN

    def _ensure_graph_static(self, x, batch_size):
        """Host-side: build the static (edges, pos, batch) structure for the
        dataset grid ONCE, keyed by (spatial shape, batch size). The jitted
        steps close over it as constants — the TPU-native replacement for
        the reference's per-batch create_graph (data_creator.py:80-156)."""
        if not self._is_gnn():
            return
        from nps_tpu.common import graph as G

        x0 = np.asarray(x)[0]
        sp = x0.shape[:-1] if x0.ndim > 1 else x0.shape
        key = (tuple(sp), int(batch_size))
        # validate against grid *content*: a same-shape grid with different
        # coordinates must not reuse stale edges (mirrors
        # DataCreator.grid_edge_index's content hash)
        chash = hash(x0.astype(np.float64).tobytes())
        if self._graph_hash.get(key) == chash:
            return
        if key in self._graph_cache:
            # grid content changed under the same (shape, batch) key: the
            # compiled steps closed over the OLD edges/positions as
            # constants — drop them or they keep predicting on stale graphs
            self._jit_cache.clear()
        self._graph_cache[key] = G.build_static_structure(
            self.data.pde, x0, self.data_creator.n, int(batch_size))
        self._graph_hash[key] = chash

    def _to_model_input(self, u0, x):
        if not self._is_gnn():
            return u0
        from nps_tpu.common import graph as G

        b = u0.shape[0]
        self._ensure_graph_static(x, b)
        edges, pos_n, batch, _ = self._graph_cache[(tuple(u0.shape[3:]),
                                                    int(b))]
        return G.GridGraph(nodes=G.grid_to_nodes(u0), edge_index=edges,
                           pos=pos_n, batch=batch)

    def _apply(self, params, data, cond, bc, pos, t_cond, spatial_cond):
        if self._is_gnn():
            if getattr(self, "pp", 0) > 1:
                raise ValueError(
                    "pipeline_parallel supports grid models only; the GNN "
                    "path shards over data instead (data_parallel=true)")
            # grid window <-> node space at the model boundary; the graph
            # structure is static so the conversion is two reshapes
            from nps_tpu.common import graph as G

            b = data.shape[0]
            sp = data.shape[3:]
            edges, pos_n, batch, meta = self._graph_cache[(tuple(sp), int(b))]
            graph = G.GridGraph(
                nodes=G.grid_to_nodes(data), edge_index=edges, pos=pos_n,
                batch=batch)
            # grid_meta stays a host-side constant closed over by the trace
            # (the shifted-grid message-passing fast path)
            out = self.model.apply(params, graph, cond=cond, bc=bc, pos=pos,
                                   t_cond=t_cond, spatial_cond=spatial_cond,
                                   grid_meta=meta)
            return G.nodes_to_grid(out, b, sp)
        if getattr(self, "pp", 0) > 1:
            # pipeline parallelism: the processor chain streams over the
            # mesh's "pipe" axis (nps_tpu.parallel.pipeline); same
            # semantics as model.apply, pinned by test_pipeline_parallel
            if self._pp_apply is None:
                from nps_tpu.parallel.pipeline import make_pipelined_apply

                n_micro = int(getattr(self.config,
                                      "pipeline_microbatches", 0) or 0)
                self._pp_apply = make_pipelined_apply(
                    self.model, self.mesh, n_micro=n_micro or None)
            return self._pp_apply(params, data, cond=cond, bc=bc, pos=pos,
                                  t_cond=t_cond, spatial_cond=spatial_cond)
        return self.model.apply(params, data, cond=cond, bc=bc, pos=pos,
                                t_cond=t_cond, spatial_cond=spatial_cond)

    def _precision(self):
        return getattr(self.config, "matmul_precision", None)

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def _make_train_step(self, unrolled, batch_size, t_res):
        pde = self.data.pde
        mi = self.model.model_interface
        ps = dict(self.config.process_settings)
        tw = self.tw
        criterion = self.criterion
        tx = self.tx
        precision = self._precision()
        zero_sh = self._zero_shardings()  # ZeRO-1 in-step constraints

        if t_res - tw - tw * unrolled + 1 <= tw:
            # jax.random.randint does not validate an empty range; it would
            # silently produce clamped/garbage windows (cf. the analogous
            # eval guard in _make_test_step)
            raise ValueError(
                f"trajectory too short to train at unroll depth {unrolled}: "
                f"t_res={t_res} needs at least tw*(unrolled+2)="
                f"{tw * (unrolled + 2)} (tw={tw})")

        def step_fn(params, opt_state, u_super, x, cond, t_cond,
                    spatial_cond, key):
            cond_, t_cond_, sc_ = _opt(cond), _opt(t_cond), _opt(spatial_cond)

            def t_window(steps):
                return (window(t_cond_, steps, tw, "labels")
                        if t_cond_ is not None else None)

            # random start step per batch element (:95)
            steps0 = jax.random.randint(
                key, (batch_size,), tw,
                t_res - tw - tw * unrolled + 1, dtype=jnp.int32)
            data, labels = window(u_super, steps0, tw, "both")
            _, bc = process_step(pde, mi, data, data, labels,
                                 get_bc=True, set_bc=False, set_min=False,
                                 process_settings=ps)

            # pushforward: `unrolled` no-grad steps via lax.scan (:115-144).
            # Runs OUTSIDE value_and_grad (params closed over) so autodiff
            # never traces it: no residual saving, no (DCE'd) backward scan
            # — the reference's torch.no_grad(), structurally.
            # With --trainer.pushforward_fast=true the body opts into a
            # cheaper forward (bf16 GN statistics, tanh GELU): its output
            # is only the next window's INPUT, never a gradient path, so
            # the tolerance is the pushforward's own noise injection.
            fast = bool(getattr(self.config, "pushforward_fast", False))

            def body(carry, _):
                from nps_tpu.models import config as model_config

                data, labels, bc, steps = carry
                with model_config.fast_forward_scope(fast):
                    pred = self._apply(params, data, cond_, bc, x,
                                       t_window(steps), sc_)
                labels_prev = labels
                steps = steps + tw
                labels = window(u_super, steps, tw, "labels")
                data, bc = process_step(pde, mi, pred, labels_prev, labels,
                                        get_bc=True, set_bc=True,
                                        set_min=True, process_settings=ps)
                return (data, labels, bc, steps), None

            carry = (data, labels, bc, steps0)
            if unrolled > 0:
                carry, _ = jax.lax.scan(body, carry, None, length=unrolled)
            data, labels, bc, steps = jax.lax.stop_gradient(carry)

            def loss_fn(params):
                # final grad-tracked step (:146-155)
                pred = self._apply(params, data, cond_, bc, x,
                                   t_window(steps), sc_)
                pred, _ = process_step(pde, mi, pred, labels, None,
                                       get_bc=False, set_bc=True, set_min=True,
                                       process_settings=ps)
                return jnp.sqrt(criterion(pred, labels))  # loss (:161-162)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            if zero_sh is not None:
                # ZeRO-1: shard the grads like the moments (the backward's
                # all-reduce becomes a reduce-scatter) and pin the updated
                # state sharded, so the optimizer math runs on 1/K shards
                # and only the param update all-gathers (base._zero_shardings)
                grads = jax.lax.with_sharding_constraint(grads, zero_sh[0])
            updates, opt_state = tx.update(grads, opt_state, params)
            if zero_sh is not None:
                opt_state = jax.lax.with_sharding_constraint(
                    opt_state, zero_sh[1])
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        def traced(params, opt_state, *args):
            with jax.default_matmul_precision(precision) if precision else \
                    _nullcontext():
                return step_fn(params, opt_state, *args)

        return jax.jit(step_fn if precision is None else traced,
                       donate_argnums=(0, 1))

    def _make_train_step_dynamic(self, batch_size, t_res):
        """One compiled step for EVERY pushforward depth.

        The no-grad pushforward unroll runs OUTSIDE ``value_and_grad``
        (nothing differentiates through it — the reference's
        ``torch.no_grad()``, ``autoregressivepushforwardtrainer.py:115-144``),
        so the per-depth ``lax.scan`` length — the only depth-static piece
        of the step — can become a traced trip count: a ``lax.fori_loop``
        over ``unrolled`` with the randint start bound as a traced operand.
        One XLA compile then serves depths 0..unrolling, deleting the
        ramp's one-compile-per-depth tax (300-400 s per depth on the axon
        remote compiler — the dominant real cost of a fresh-shape
        convergence run, BASELINE.md "Compile-ahead measured at fresh
        shapes"). Depth parity vs the static builder is pinned by
        tests/test_dynamic_unroll.py.
        """
        pde = self.data.pde
        mi = self.model.model_interface
        ps = dict(self.config.process_settings)
        tw = self.tw
        criterion = self.criterion
        tx = self.tx
        precision = self._precision()
        zero_sh = self._zero_shardings()  # ZeRO-1 in-step constraints

        def step_fn(params, opt_state, u_super, x, cond, t_cond,
                    spatial_cond, key, unrolled):
            cond_, t_cond_, sc_ = _opt(cond), _opt(t_cond), _opt(spatial_cond)

            def t_window(steps):
                return (window(t_cond_, steps, tw, "labels")
                        if t_cond_ is not None else None)

            # random start step per batch element (:95); the upper bound is
            # a traced function of the depth operand (validated host-side in
            # train_step — jax.random.randint cannot check a traced range)
            steps0 = jax.random.randint(
                key, (batch_size,), tw,
                t_res - tw - tw * unrolled + 1, dtype=jnp.int32)
            data, labels = window(u_super, steps0, tw, "both")
            _, bc = process_step(pde, mi, data, data, labels,
                                 get_bc=True, set_bc=False, set_min=False,
                                 process_settings=ps)

            fast = bool(getattr(self.config, "pushforward_fast", False))

            def body(_i, carry):
                from nps_tpu.models import config as model_config

                data, labels, bc, steps = carry
                with model_config.fast_forward_scope(fast):
                    pred = self._apply(params, data, cond_, bc, x,
                                       t_window(steps), sc_)
                labels_prev = labels
                steps = steps + tw
                labels = window(u_super, steps, tw, "labels")
                data, bc = process_step(pde, mi, pred, labels_prev, labels,
                                        get_bc=True, set_bc=True,
                                        set_min=True, process_settings=ps)
                return (data, labels, bc, steps)

            carry = (data, labels, bc, steps0)
            carry = jax.lax.fori_loop(0, unrolled, body, carry)
            data, labels, bc, steps = jax.lax.stop_gradient(carry)

            def loss_fn(params):
                pred = self._apply(params, data, cond_, bc, x,
                                   t_window(steps), sc_)
                pred, _ = process_step(pde, mi, pred, labels, None,
                                       get_bc=False, set_bc=True, set_min=True,
                                       process_settings=ps)
                return jnp.sqrt(criterion(pred, labels))  # loss (:161-162)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            if zero_sh is not None:
                grads = jax.lax.with_sharding_constraint(grads, zero_sh[0])
            updates, opt_state = tx.update(grads, opt_state, params)
            if zero_sh is not None:
                opt_state = jax.lax.with_sharding_constraint(
                    opt_state, zero_sh[1])
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, opt_state, loss

        def traced(params, opt_state, *args):
            with jax.default_matmul_precision(precision) if precision else \
                    _nullcontext():
                return step_fn(params, opt_state, *args)

        return jax.jit(step_fn if precision is None else traced,
                       donate_argnums=(0, 1))

    def _use_dynamic_unroll(self):
        return bool(getattr(self.config, "dynamic_unroll", True))

    def _make_test_step(self, batch_size, t_res, has_base, use_mask=False,
                        include_data=False):
        pde = self.data.pde
        mi = self.model.model_interface
        ps = dict(self.config.process_settings)
        tw = self.tw
        criterion = self.criterion
        spatial_cells = math.prod(self.config.base_resolution[1:])
        steps_list = list(range(tw, t_res - tw + 1, tw))
        if not steps_list:
            raise ValueError(
                f"evaluation needs at least one (input, label) window pair: "
                f"t_res={t_res} < 2*time_window={2 * tw}. Use a dataset with "
                f"nt >= 2*time_window or lower --time_window.")

        def fn(params, u_base, u_super, x, cond, t_cond, spatial_cond,
               lengths):
            cond_, t_cond_, sc_ = _opt(cond), _opt(t_cond), _opt(spatial_cond)
            u_base_ = _opt(u_base)
            mask = None
            if use_mask:
                # validity mask built ON DEVICE from the per-element time
                # lengths (vs the reference's host-side numpy fill,
                # utils/collate_batch_helpers.py): under GSPMD the mask
                # inherits u_super's batch sharding, so multi-process
                # evaluation never gathers the global lengths to a host
                iota = jax.lax.broadcasted_iota(jnp.int32, u_super.shape, 2)
                lens = lengths.reshape((-1,) + (1,) * (u_super.ndim - 1))
                mask = (iota < lens).astype(u_super.dtype)

            # one-step losses at tw-strided starts (:217-266)
            step_losses = []
            for step in steps_list:
                data = u_super[:, :, step - tw:step]
                labels = u_super[:, :, step:step + tw]
                _, bc = process_step(pde, mi, data, data, labels, get_bc=True,
                                     set_bc=False, set_min=False,
                                     process_settings=ps)
                tc = (t_cond_[:, :, step:step + tw]
                      if t_cond_ is not None else None)
                pred = self._apply(params, data, cond_, bc, x, tc, sc_)
                if use_mask:
                    m_w = mask[:, :, step:step + tw]
                    pred = pred * m_w
                    labels = labels * m_w
                pred, _ = process_step(pde, mi, pred, labels, None,
                                       get_bc=False, set_bc=True, set_min=True,
                                       process_settings=ps)
                step_losses.append(criterion(pred, labels) / batch_size)
            step_losses = jnp.stack(step_losses)

            # unrolled rollout losses (:442-514); with include_data the same
            # scan also emits the predictions, so the rollout runs ONCE
            sim = self._simulate_scan(
                params, u_super, cond_, x, t_cond_, sc_,
                nr_gt_steps=self.config.nr_gt_steps, t_res=t_res,
                compute_loss=True, include_data=include_data, use_bc=True,
                clip_min=True, divide_by_t=True, batch_size=batch_size,
                u_mask=mask if use_mask else None)
            unrolled_losses = sim["losses"] if include_data else sim
            unrolled_sum = jnp.sum(unrolled_losses)

            # numerical-baseline losses (:476-496)
            if has_base:
                base_losses = []
                n_t = 0
                for step in range(tw * self.config.nr_gt_steps,
                                  t_res - tw + 1, tw):
                    lab_s = u_super[:, :, step:step + tw]
                    lab_b = u_base_[:, :, step:step + tw]
                    base_losses.append(
                        criterion(lab_s, lab_b) / spatial_cells / batch_size)
                    n_t += tw
                base_sum = jnp.sum(jnp.stack(base_losses)) / max(n_t, 1)
            else:
                base_sum = jnp.zeros(())

            out = dict(
                step_losses=step_losses,
                mean_step_loss=jnp.mean(step_losses),
                unrolled_losses=unrolled_sum,
                unrolled_base_losses=base_sum,
            )
            if include_data:
                out["preds"] = sim["preds"]
                out["labels_seq"] = sim["labels_seq"]
            return out

        return jax.jit(fn)

    # the scan core shared by test_step and the public simulate()
    def _simulate_scan(self, params, u, cond, x, t_cond, spatial_cond,
                       nr_gt_steps, t_res, compute_loss, include_data,
                       use_bc, clip_min, divide_by_t, batch_size, u_bc=None,
                       u_mask=None):
        pde = self.data.pde
        mi = self.model.model_interface
        ps = dict(self.config.process_settings)
        tw = self.tw
        criterion = self.criterion
        spatial_cells = math.prod(self.config.base_resolution[1:])
        steps_list = list(range(tw * nr_gt_steps, t_res - tw + 1, tw))
        if not steps_list:
            raise ValueError(
                f"simulate() needs at least one rollout window: t_res="
                f"{t_res} < {nr_gt_steps + 1}*time_window (tw={tw}, "
                f"nr_gt_steps={nr_gt_steps}). Use a longer trajectory or "
                f"lower --time_window.")
        n_t = tw * len(steps_list)
        if u_bc is None:
            u_bc = u

        pred0 = u[:, :, tw * nr_gt_steps - tw: tw * nr_gt_steps]
        bc0 = u_bc[:, :, tw * nr_gt_steps - tw: tw * nr_gt_steps]

        # static tw-strided windows stacked for the scan
        labels_seq = (jnp.stack([u[:, :, s:s + tw] for s in steps_list])
                      if compute_loss else None)
        bc_seq = jnp.stack([u_bc[:, :, s:s + tw] for s in steps_list]) \
            if use_bc else None
        tc_seq = (jnp.stack([t_cond[:, :, s:s + tw] for s in steps_list])
                  if t_cond is not None else None)
        mask_seq = (jnp.stack([u_mask[:, :, s:s + tw] for s in steps_list])
                    if u_mask is not None else None)

        def body(carry, xs):
            pred, bc_prev_win = carry
            labels_t, bc_t, tc_t, mask_t = xs
            if use_bc:
                _, bc = process_step(pde, mi, pred, bc_prev_win, bc_t,
                                     get_bc=True, set_bc=False, set_min=False,
                                     process_settings=ps)
                bc_next_win = bc_t
            else:
                bc, bc_next_win = None, bc_prev_win
            pred = self._apply(params, pred, cond, bc, x, tc_t, spatial_cond)
            if mask_t is not None and compute_loss:
                pred = pred * mask_t
                labels_t = labels_t * mask_t
            if use_bc:
                pred, _ = process_step(pde, mi, pred, bc_t, None, get_bc=False,
                                       set_bc=True, set_min=False,
                                       process_settings=ps)
            if clip_min:
                pred, _ = process_step(pde, mi, pred, None, None, get_bc=False,
                                       set_bc=False, set_min=True,
                                       process_settings=ps)
            outs = []
            if compute_loss:
                loss = criterion(pred, labels_t) / spatial_cells / batch_size
                outs.append(loss)
            if include_data:
                outs.append(pred)
            return (pred, bc_next_win), tuple(outs)

        n = len(steps_list)
        zeros = jnp.zeros((n,))
        xs = (labels_seq if labels_seq is not None else zeros,
              bc_seq if bc_seq is not None else zeros,
              tc_seq if tc_seq is not None else zeros,
              mask_seq if mask_seq is not None else zeros)

        # re-wrap: scan needs structured xs; replace placeholders with None
        def body_wrap(carry, xs):
            labels_t = xs[0] if compute_loss else None
            bc_t = xs[1] if use_bc else None
            tc_t = xs[2] if tc_seq is not None else None
            mask_t = xs[3] if mask_seq is not None else None
            return body(carry, (labels_t, bc_t, tc_t, mask_t))

        (_, _), outs = jax.lax.scan(body_wrap, (pred0, bc0), xs)
        result = {}
        i = 0
        if compute_loss:
            losses = outs[i]
            i += 1
            if divide_by_t:
                losses = losses / n_t
            result["losses"] = losses
        if include_data:
            result["preds"] = outs[i]
        if compute_loss and include_data:
            result["labels_seq"] = labels_seq
        if not include_data:
            return result["losses"]
        return result

    # ------------------------------------------------------------------
    # public step API (parity signatures)
    # ------------------------------------------------------------------
    def train_step(self, batch, epoch, batch_idx, loader):
        if self.data.data_interface == D.sim1d_var_t:
            # variable-time: min-cropped batch; unroll depth from the batch
            # sampler (parity: :67-69, :83-85)
            u_base, u_super, x, cond, t_cond, spatial_cond, _lengths = batch
            t_res = int(u_super.shape[2])
            batch_size = u_super.shape[0]
            unrolled = (loader.batch_sampler.get_t_batch(batch_idx)
                        if loader is not None else 0)
        else:
            u_base, u_super, x, cond, t_cond, spatial_cond = batch
            t_res = (int(u_super.shape[2]) if hasattr(u_super, "shape")
                     else self.t_res)
            batch_size = u_super.shape[0]

            # unroll ramp + uniform-random depth (host RNG; :78-82)
            unrolling_epoch = epoch // self.config.lr_step_interval
            max_unrolling = min(unrolling_epoch, self.config.unrolling)
            unrolled = py_random.choice(list(range(max_unrolling + 1)))

        self._ensure_graph_static(x, batch_size)
        dynamic = self._use_dynamic_unroll()
        if dynamic:
            # one depth-generic compiled step (traced trip count); the
            # range check the static builder does at trace time moves here
            # (jax.random.randint cannot validate a traced bound)
            tw = self.tw
            if t_res - tw - tw * unrolled + 1 <= tw:
                raise ValueError(
                    f"trajectory too short to train at unroll depth "
                    f"{unrolled}: t_res={t_res} needs at least "
                    f"tw*(unrolled+2)={tw * (unrolled + 2)} (tw={tw})")
            step_key = ("train_dyn", batch_size, t_res)
            fn = self._jit(step_key,
                           lambda: self._make_train_step_dynamic(batch_size,
                                                                 t_res))
        else:
            step_key = ("train", unrolled, batch_size, t_res)
            if self._precompile_thread is not None:
                # if the compile-ahead worker is mid-compile on exactly this
                # depth, block for its warm compile instead of racing a
                # duplicate inline compile of the same function
                with self._key_lock(step_key):
                    pass
            fn = self._jit(step_key,
                           lambda: self._make_train_step(unrolled, batch_size,
                                                         t_res))
        from nps_tpu.utils.seed import get_seed

        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(get_seed()), epoch),
            batch_idx)
        if self.data.data_interface != D.sim1d_var_t and not dynamic:
            # launch (once) the compile-ahead worker for the ramp's future
            # depths — abstract shapes must be captured BEFORE the donating
            # call below invalidates params/opt_state buffers. The dynamic
            # step has no per-depth compiles to warm.
            self._maybe_precompile_ahead(
                (u_super, x, cond, t_cond, spatial_cond, key))
        # retried on transient remote-compile tunnel drops ONLY (narrow
        # message gate; donated buffers are untouched by a failed compile)
        from nps_tpu.utils.retry import with_compile_retry

        args = (u_super, x, cond, t_cond, spatial_cond, key)
        if dynamic:
            args = args + (jnp.asarray(unrolled, jnp.int32),)
        self.params, self.opt_state, loss = with_compile_retry(
            fn, self.params, self.opt_state, *args)
        return loss, None

    def test_step(self, batch, batch_idx, use_train_loss_calc=False,
                  include_data=False, max_test_len=None):
        if use_train_loss_calc:
            raise RuntimeError(
                "use_train_loss_calc=True is unexpected: test_step is "
                "implemented")
        lengths = None
        if self.data.data_interface == D.sim1d_var_t:
            # max-padded batch: mask invalid frames (parity: :191-199).
            # The mask itself is built inside the jitted step from the
            # per-element lengths so a multi-process fleet never reads a
            # batch-sharded global array back to the host.
            u_base, u_super, x, cond, t_cond, spatial_cond, lengths = batch
            lengths = jnp.asarray(lengths, jnp.int32)
            if max_test_len is not None:
                lengths = jnp.minimum(lengths, max_test_len)
        else:
            u_base, u_super, x, cond, t_cond, spatial_cond = batch
        t_res = int(u_super.shape[2])
        if max_test_len is not None:
            t_res = min(max_test_len, t_res)
        batch_size = int(u_super.shape[0])
        has_base = u_base is not None and u_base.size > 0
        use_mask = lengths is not None

        self._ensure_graph_static(x, batch_size)
        fn = self._jit(("test", batch_size, t_res, has_base, use_mask,
                        include_data),
                       lambda: self._make_test_step(batch_size, t_res,
                                                    has_base,
                                                    use_mask=use_mask,
                                                    include_data=include_data))
        from nps_tpu.utils.retry import with_compile_retry

        out = with_compile_retry(fn, self.params, u_base, u_super, x, cond,
                                 t_cond, spatial_cond, lengths)

        tw = self.tw
        steps_list = list(range(tw, t_res - tw + 1, tw))
        step_losses = np.asarray(out["step_losses"])
        info = {
            "Unrolled base losses": float(out["unrolled_base_losses"]),
            "Unrolled forward losses": float(out["unrolled_losses"]),
            "Mean per-step loss": float(out["mean_step_loss"]),
        }
        for s, v in zip(steps_list, step_losses):
            info[f"Step {s}, mean loss"] = float(v)

        main_loss = float(out["unrolled_losses"])
        if include_data:
            # predictions come from the same jitted rollout scan that
            # produced the losses above — no second rollout
            pred0 = np.asarray(
                u_super[:, :, tw * self.config.nr_gt_steps - tw:
                        tw * self.config.nr_gt_steps])
            data_pred = np.concatenate(
                [pred0, _frames(out["preds"])], axis=2)
            data_gt = np.concatenate(
                [pred0, _frames(out["labels_seq"])], axis=2)
            data_other = [{} for _ in range(batch_size)]
            return main_loss, info, (data_gt, data_pred, data_other)
        return main_loss, info

    def simulate(self, u, conditioning, x, compute_loss, include_data,
                 nr_gt_steps, t_res, t_conditioning=None,
                 spatial_conditioning=None, clip_min=True, use_bc=True,
                 u_bc=None, u_mask=None, divide_by_t=True):
        """Rollout inference API (parity: ``:288-440``); returns numpy."""
        u = jnp.asarray(u)
        batch_size = int(u.shape[0])
        tw = self.tw
        if compute_loss and u.shape[2] < t_res:
            raise ValueError("Cannot compute loss if no ground-truth "
                             "simulation is provided for the full rollout")
        if u.shape[2] < nr_gt_steps * tw:
            raise ValueError("The data is shorter than nr_gt_steps*tw")
        if u_mask is not None and not compute_loss:
            raise ValueError("Mask supplied but compute_loss=False!")
        if not compute_loss and not include_data:
            # the reference returns ([], ([], [])) here after running the
            # whole rollout for nothing (:435-440); fail loudly instead
            raise ValueError(
                "simulate() with compute_loss=False and include_data=False "
                "returns nothing; request at least one output")

        cond_ = _opt(jnp.asarray(conditioning)
                     if conditioning is not None else None)
        t_cond_ = _opt(jnp.asarray(t_conditioning)
                       if t_conditioning is not None else None)
        sc_ = _opt(jnp.asarray(spatial_conditioning)
                   if spatial_conditioning is not None else None)
        u_bc_ = jnp.asarray(u_bc) if u_bc is not None else None
        u_mask_ = jnp.asarray(u_mask) if u_mask is not None else None

        self._ensure_graph_static(x, batch_size)
        # the whole rollout runs as ONE cached jitted scan (keyed by shapes
        # and static flags); None args are static pytree structure
        key = ("simulate", u.shape, t_res, nr_gt_steps, compute_loss,
               include_data, use_bc, clip_min, divide_by_t,
               cond_ is not None, t_cond_ is not None, sc_ is not None,
               u_bc_ is not None, u_mask_ is not None)

        def build():
            def fn(params, u, cond, x, t_cond, sc, u_bc, u_mask):
                return self._simulate_scan(
                    params, u, cond, x, t_cond, sc,
                    nr_gt_steps=nr_gt_steps, t_res=t_res,
                    compute_loss=compute_loss, include_data=include_data,
                    use_bc=use_bc, clip_min=clip_min, divide_by_t=divide_by_t,
                    batch_size=batch_size, u_bc=u_bc, u_mask=u_mask)
            return jax.jit(fn)

        from nps_tpu.utils.retry import with_compile_retry

        res = with_compile_retry(
            self._jit(key, build),
            self.params, u, cond_, jnp.asarray(x), t_cond_, sc_, u_bc_,
            u_mask_)

        if not include_data:
            return [l for l in np.asarray(res)]

        pred0 = np.asarray(u[:, :, tw * nr_gt_steps - tw: tw * nr_gt_steps])
        data_pred = np.concatenate([pred0, _frames(res["preds"])], axis=2)
        if compute_loss:
            data_gt = np.concatenate([pred0, _frames(res["labels_seq"])],
                                     axis=2)
            losses = [l for l in np.asarray(res["losses"])]
            return losses, (data_gt, data_pred)
        return data_pred

    def _test_unrolled_losses(self, batch, include_data=False,
                              max_test_len=None, divide_by_t=True):
        u_base, u_super, x, cond, t_cond, spatial_cond = batch
        t_res = int(u_super.shape[2])
        out = self.simulate(
            u_super, cond, x, compute_loss=True, include_data=include_data,
            nr_gt_steps=self.config.nr_gt_steps, t_res=t_res,
            t_conditioning=t_cond, spatial_conditioning=spatial_cond,
            divide_by_t=divide_by_t)
        if include_data:
            losses, (data_gt, data_pred) = out
            return (float(np.sum(losses)), 0.0,
                    [data_gt, data_pred, [{} for _ in range(u_super.shape[0])]])
        return float(np.sum(out)), 0.0


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
