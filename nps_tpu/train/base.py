"""Training runtime backbone.

Capability parity with ``src/trainers/base.py`` (TrainInterface): interface
compatibility asserts, dataloaders, the epoch loop with periodic named
validation -> best-model save -> test-on-best, weighted-average test
aggregation with optional data collection, stdout/wandb metric sinks, and
best/final model export.

Beyond the reference (SURVEY.md §5 gaps -> first-class here):
- functional state: (params, opt_state) pytrees updated by jitted steps
  with donated buffers; no hidden module state;
- full checkpoint/RESUME (params + opt state + epoch + host RNG), which the
  reference lacks entirely (save-only);
- samples/sec/chip throughput counters and optional ``jax.profiler`` traces;
- optional data-parallel sharding over a device mesh (``nps_tpu.parallel``).
"""

import os
import pickle
import time
import warnings
from abc import ABCMeta, abstractmethod
from argparse import Namespace

import numpy as np
import jax
import jax.numpy as jnp
import flax.serialization

from nps_tpu.common.interfaces import D, M  # noqa: F401
from nps_tpu.data.pipeline import HostDataLoader, prefetch_to_device
from nps_tpu.train import optim as optim_lib
from nps_tpu.utils import misc as util

WANDB_AVAILABLE = True
try:
    import wandb
except ModuleNotFoundError:
    WANDB_AVAILABLE = False




def _weighted_add(acc, v, bs):
    """Accumulate a batch metric weighted by batch size; recurses into
    nested dicts (test_step implementations may return per-step dicts)."""
    if isinstance(v, dict):
        acc = acc or {}
        return {k: _weighted_add(acc.get(k), vv, bs) for k, vv in v.items()}
    v = util.to_float(v) * bs
    return v if acc is None else acc + v


def _weighted_div(v, n):
    if isinstance(v, dict):
        return {k: _weighted_div(vv, n) for k, vv in v.items()}
    return v / n


class TrainInterface(metaclass=ABCMeta):
    def __init__(self, model, data, criterion, optimizer=None,
                 lr_scheduler=None, config=None, save_path="models/model",
                 max_train_batches=float("inf"), max_test_batches=float("inf"),
                 epoch_callback=None, use_wandb=False, wandb_kwargs=None,
                 wandb_config_dict=None, **kwargs):
        self.model = model
        self.data = data
        self.config = config if config is not None else Namespace(**kwargs)
        self.config.save_path = save_path
        if not hasattr(self.config, "variable_time"):
            self.config.variable_time = self.data.data_interface == D.sim1d_var_t

        self.criterion = criterion
        self.optimizer_spec = optimizer      # config dict or (optax, lr)
        self.lr_scheduler_spec = lr_scheduler

        self.max_train_batches = max_train_batches
        self.max_test_batches = max_test_batches
        self.epoch_callback = epoch_callback

        if not hasattr(self.config, "print_setting"):
            self.print_setting = dict(print_per_step=False)
        else:
            self.print_setting = dict(self.config.print_setting)

        self.use_wandb = use_wandb and WANDB_AVAILABLE
        if use_wandb and not WANDB_AVAILABLE:
            warnings.warn("Could not import WandB -- WandB not used!")
        self.wandb_kwargs = wandb_kwargs
        self.wandb_config_dict = wandb_config_dict

        self.test_kwargs_list = getattr(self.config, "test_kwargs_list",
                                        [("default", {})])

        cd = getattr(self.config, "compute_dtype", None)
        if cd:
            from nps_tpu.models.config import set_compute_dtype

            set_compute_dtype(cd)

        # persistent XLA compilation cache: restarted/resumed jobs skip
        # identical full-step compiles (utils/compile_cache.py)
        from nps_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(getattr(self.config, "compile_cache_dir", None))

        # debug-mode knobs (SURVEY.md §5 "race detection/sanitizers" slot):
        # structural determinism is native to JAX; NaN tracing is opt-in
        if getattr(self.config, "debug_nans", False):
            jax.config.update("jax_debug_nans", True)
        if getattr(self.config, "enable_checks", False):
            jax.config.update("jax_enable_checks", True)

        # ---- preemption-safe shutdown (SURVEY.md §5 failure recovery) ----
        self.preempted = False
        self._preempt_requested = False
        self._last_epoch_partial = False

        # ---- functional training state ----
        self.params = None
        self.opt_state = None
        self.tx = None
        self.lr_scheduler = None
        self.sharding = None
        self.start_epoch = 0
        self._init_device()

    # ------------------------------------------------------------------
    # devices / sharding
    # ------------------------------------------------------------------
    def _init_device(self):
        requested = str(getattr(self.config, "device", "default")).lower()
        platform = {"cuda": None, "gpu": None, "tpu": None,
                    "default": None, "cpu": "cpu"}.get(requested, None)
        if requested == "cpu":
            try:
                self.device = jax.devices("cpu")[0]
            except RuntimeError:
                self.device = jax.devices()[0]
        else:
            self.device = jax.devices()[0]
        self.platform = self.device.platform
        if self.platform == "tpu":
            # advertise this process as the single-client tunnel holder so
            # a round-end bench can preempt it instead of hanging
            # (utils/chip_lock.py; SIGTERM lands in the preemption handlers
            # below -> batch-boundary checkpoint -> clean exit)
            from nps_tpu.utils.chip_lock import advertise

            advertise()

        n_spatial = int(getattr(self.config, "spatial_parallel", 0) or 0)
        n_tp = int(getattr(self.config, "tensor_parallel", 0) or 0)
        n_pp = int(getattr(self.config, "pipeline_parallel", 0) or 0)
        n_ep = int(getattr(self.config, "expert_parallel", 0) or 0)
        self.tp = 0
        self.pp = 0
        self.ep = 0
        if n_ep > 1:
            # 2-D ("data", "expert") mesh: batches shard on "data", MoE
            # expert weight stacks (leading n_experts axis) on "expert";
            # GSPMD partitions the vmapped expert compute and psums the
            # gate contraction (nps_tpu.parallel.expert)
            if n_tp > 1 or n_spatial > 1 or n_pp > 1:
                raise ValueError(
                    "expert_parallel composes with data parallelism only; "
                    "unset tensor/spatial/pipeline_parallel")
            from jax.sharding import NamedSharding, PartitionSpec as P

            from nps_tpu.parallel.expert import make_dp_ep_mesh

            devices = [d for d in jax.devices()
                       if d.platform == self.device.platform]
            self.mesh = make_dp_ep_mesh(n_ep, devices)
            self.sharding = NamedSharding(self.mesh, P("data"))
            self.ep = n_ep
        elif n_pp > 1:
            # 2-D ("data", "pipe") mesh: batches shard on "data", processor
            # stages stream over "pipe" via shard_map + ppermute
            # (nps_tpu.parallel.pipeline). Params stay replicated — PP here
            # shards compute/activations, not weights.
            if n_tp > 1 or n_spatial > 1:
                raise ValueError(
                    "pipeline_parallel composes with data parallelism only; "
                    "unset tensor_parallel/spatial_parallel")
            from jax.sharding import NamedSharding, PartitionSpec as P

            from nps_tpu.parallel.pipeline import make_dp_pp_mesh

            devices = [d for d in jax.devices()
                       if d.platform == self.device.platform]
            self.mesh = make_dp_pp_mesh(n_pp, devices)
            self.sharding = NamedSharding(self.mesh, P("data"))
            self.pp = n_pp
            # an n_micro that can never divide the steady-state per-data-rank
            # batch would silently route EVERY batch through the sequential
            # remainder fallback — no pipelining at all; fail at setup
            n_micro = int(getattr(self.config, "pipeline_microbatches", 0)
                          or 0)
            if n_micro:
                bs = int(self.config.batch_size)
                n_data = len(devices) // n_pp
                if bs % n_data != 0 or (bs // n_data) % n_micro != 0:
                    raise ValueError(
                        f"pipeline_microbatches={n_micro} never divides the "
                        f"steady-state per-data-rank batch "
                        f"({bs}/{n_data} data ranks): every batch would "
                        f"fall back to the sequential (unpipelined) apply. "
                        f"Pick batch_size/microbatches so that "
                        f"(batch_size // {n_data}) % microbatches == 0")
        elif n_tp > 1:
            # 2-D ("data", "model") mesh: batches shard on "data", weight
            # out-feature dims on "model"; GSPMD inserts the weight
            # all-gathers / grad reduce-scatters (nps_tpu.parallel.tensor)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from nps_tpu.parallel import make_dp_tp_mesh

            devices = [d for d in jax.devices()
                       if d.platform == self.device.platform]
            self.mesh = make_dp_tp_mesh(n_tp, devices)
            self.sharding = NamedSharding(self.mesh, P("data"))
            self.tp = n_tp
        elif n_spatial > 1:
            # 2-D ("data", "x") mesh: DP rows x spatially-sharded columns;
            # XLA GSPMD inserts halo exchanges / psums inside the jitted steps
            from nps_tpu.parallel import GridBatchSharding, make_grid_mesh

            devices = [d for d in jax.devices()
                       if d.platform == self.device.platform]
            self.mesh = make_grid_mesh(n_spatial, devices)
            self.sharding = GridBatchSharding(self.mesh)
        elif getattr(self.config, "data_parallel", False):
            from nps_tpu.parallel import make_mesh, batch_sharding

            devices = [d for d in jax.devices()
                       if d.platform == self.device.platform]
            self.mesh = make_mesh(devices)
            self.sharding = batch_sharding(self.mesh)
        else:
            self.mesh = None

    def __repr__(self):
        return self.__class__.__name__

    @property
    @abstractmethod
    def model_interface(self):
        raise NotImplementedError("model_interface not set!")

    @property
    @abstractmethod
    def data_interface(self):
        raise NotImplementedError("data_interface not set!")

    # ------------------------------------------------------------------
    # optimizer / params plumbing
    # ------------------------------------------------------------------
    def get_parameters(self):
        return jax.tree_util.tree_leaves(self.params) if self.params else []

    def set_optimizer(self, optimizer):
        self.optimizer_spec = optimizer
        if self.params is not None:
            self._build_optimizer()

    def set_lr_scheduler(self, lr_scheduler):
        self.lr_scheduler_spec = lr_scheduler
        self._build_lr_scheduler()

    def _build_optimizer(self):
        if self.optimizer_spec is None:
            return
        spec = self.optimizer_spec
        if isinstance(spec, dict):
            self.tx, self.base_lr = optim_lib.build_optimizer(**spec)
        else:
            self.tx, self.base_lr = spec
        accum = int(getattr(self.config, "grad_accum", 0) or 0)
        if accum > 1:
            # gradient accumulation: optax.MultiSteps averages grads over
            # `accum` mini-batches and applies one optimizer step at the
            # boundary — the effective batch is accum x batch_size with
            # unchanged per-step HBM (pairs with large-grid configs where
            # the per-chip batch is capacity-capped)
            import optax

            self.tx = optax.MultiSteps(self.tx, every_k_schedule=accum)
        self.opt_state = self.tx.init(self.params)
        if self._zero1():
            # ZeRO-1: the Adam moments shard over the "data" axis instead
            # of replicating; XLA derives the reduce/update/all-gather
            # schedule inside the existing jitted step (parallel/zero.py)
            from nps_tpu.parallel import shard_opt_state

            self.opt_state = shard_opt_state(self.opt_state, self.mesh)
        elif self.mesh is not None:
            # tx.init leaves optax wrapper counters (MultiSteps' mini_step/
            # gradient_step under grad_accum) on the default device even
            # when the params live on the mesh; AOT lowering (compile-ahead)
            # rejects the mixed device sets. Mirror the resume path: place
            # the whole state per the trainer's parallel mode.
            self.opt_state = self._place_state(self.opt_state)
        self._build_lr_scheduler()
        self._on_state_rebuilt()

    def _zero1(self):
        if not getattr(self.config, "zero1", False):
            return False
        if self.mesh is None or "data" not in dict(self.mesh.shape):
            raise ValueError(
                "zero1=true needs a device mesh with a 'data' axis: enable "
                "data_parallel (or a dp x spatial/pipeline/expert layout)")
        if self.tp > 1:
            raise ValueError(
                "zero1 is redundant under tensor_parallel: tx.init on the "
                "TP-sharded params already shards the moments with the "
                "weights")
        if self.ep > 1:
            raise ValueError(
                "zero1 is redundant under expert_parallel: tx.init on the "
                "expert-sharded params already shards the moments on the "
                "'expert' axis; re-placing them on 'data' would force a "
                "full reshard of every expert grad+moment each step")
        return True

    def _zero_shardings(self):
        """(grads, opt_state) NamedSharding trees for the in-step ZeRO-1
        constraints, or None. Input sharding alone is NOT enough: left
        free, the partitioner may all-gather the sharded moments to meet
        the replicated gradients (measured: +2.5 GB peak at 512², worse
        than no ZeRO at all). Constraining the gradients to the moment
        sharding turns the grad all-reduce into a reduce-scatter and keeps
        the whole optimizer update sharded; only the param update
        all-gathers (the ZeRO-1 schedule)."""
        if not self._zero1() or self.opt_state is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nps_tpu.parallel.zero import opt_state_specs

        def named(tree):
            return jax.tree_util.tree_map(
                lambda s: NamedSharding(self.mesh, s), tree,
                is_leaf=lambda x: isinstance(x, P))

        return (named(opt_state_specs(self.params, self.mesh)),
                named(opt_state_specs(self.opt_state, self.mesh)))

    def _build_lr_scheduler(self):
        spec = self.lr_scheduler_spec
        if self.tx is None:
            return
        if spec is None:
            self.lr_scheduler = optim_lib.ConstantLR(self.base_lr)
        elif isinstance(spec, dict):
            self.lr_scheduler = optim_lib.build_lr_scheduler(
                self.base_lr, **spec)
        else:
            self.lr_scheduler = spec

    def _on_state_rebuilt(self):
        """Hook for subclasses to drop cached jitted fns."""

    def _to_model_input(self, u0, x):
        """Hook: convert a grid window into the model's input structure
        (identity for grids; the pushforward trainer wraps GNN inputs into
        a static GridGraph)."""
        return u0

    def init_params(self, batch):
        """Initialize model parameters from a sample batch (the reference's
        'lazy init after a first forward pass', made explicit)."""
        from nps_tpu.utils.seed import get_seed

        u_base, u, x, cond, t_cond, spatial_cond = batch[:6]
        tw = self.config.time_window
        u0 = self._to_model_input(jnp.asarray(u[:, :, :tw]), x)
        key = jax.random.PRNGKey(get_seed())
        self.params = jax.jit(self.model.init)(
            key, u0, cond=jnp.asarray(cond), bc=None, pos=jnp.asarray(x),
            t_cond=(jnp.asarray(t_cond[:, :, :tw])
                    if t_cond.size else jnp.asarray(t_cond)),
            spatial_cond=jnp.asarray(spatial_cond))
        if self.sharding is not None:
            self.params = self._place_state(self.params)
        if self.optimizer_spec is not None and self.tx is None:
            self._build_optimizer()
        return self.params

    def _place_state(self, tree):
        """Place a params/opt-state pytree per the trainer's parallel mode:
        model-axis weight sharding under tensor parallelism, expert-axis
        sharding under expert parallelism, replication on any other mesh,
        plain device placement otherwise."""
        if self.mesh is None:
            return jax.device_put(tree)
        if self.tp > 1:
            from nps_tpu.parallel import shard_params

            return shard_params(tree, self.mesh)
        if self.ep > 1:
            from nps_tpu.parallel import shard_expert_params

            return shard_expert_params(tree, self.mesh)
        from nps_tpu.parallel import replicate

        return replicate(tree, self.mesh)

    def ensure_initialized(self, loader):
        if self.params is None:
            batch = next(iter(loader))
            self.init_params(batch)
        if self.tx is None and self.optimizer_spec is not None:
            self._build_optimizer()

    # ------------------------------------------------------------------
    # data loading
    # ------------------------------------------------------------------
    def get_dataloaders(self):
        from nps_tpu.utils.seed import get_seed

        if self.config.variable_time:
            # parity: trainers/base.py:180-216 — batch sampler + min-crop
            # collate for training, max-pad for evaluation. Multi-process:
            # every process runs the identical seeded sampler and collates
            # its slice of each global batch (see VariableTimeLoader).
            from nps_tpu.data.pipeline import VariableTimeLoader
            from nps_tpu.data.samplers import VariableTimeBatchSampler

            gm = 1
            if jax.process_count() > 1:
                if self.mesh is None:
                    raise ValueError(
                        "multi-host variable-time training requires a "
                        "device mesh: set trainer.data_parallel=true (or "
                        "tensor_parallel=K) — without one each process "
                        "would silently train its own divergent model")
                if hasattr(self.sharding, "shard_batch"):
                    # multi-host spatial: validate the process/mesh layout
                    # up front (assemble_global_grid_batch re-checks per
                    # batch); 1D var-t fields never shard x, so this
                    # reduces to DP semantics on the grid mesh
                    from nps_tpu.parallel.multihost import \
                        validate_grid_mesh_process_layout

                    validate_grid_mesh_process_layout(self.mesh)
                gm = dict(self.mesh.shape).get("data", 1)
                if gm % jax.process_count():
                    raise ValueError(
                        f"multi-host variable-time training needs the "
                        f"mesh 'data' axis ({gm}) to be a multiple of "
                        f"the process count ({jax.process_count()}): "
                        f"lower tensor_parallel/expert_parallel so the "
                        f"data axis spans whole processes")
                if self.config.batch_size % gm:
                    raise ValueError(
                        f"batch_size={self.config.batch_size} must divide "
                        f"by the mesh's 'data' extent {gm} for multi-host "
                        f"variable-time training")

            sampler_cfg = dict(getattr(self.config, "sampler", {}) or {})
            sampler_cfg.pop("object", None)
            sampler_cfg.setdefault("time_window", self.config.time_window)
            sampler_cfg.setdefault("max_unrolling",
                                   getattr(self.config, "unrolling", 0))
            with_repl = sampler_cfg.pop("with_replacement", True)
            tw = self.config.time_window
            bs = self.config.batch_size

            ebs = int(getattr(self.config, "eval_batch_size", 0) or bs)

            def mk(split, mode, wr, bsz=bs):
                sampler = VariableTimeBatchSampler(
                    split, batch_size=bsz, with_replacement=wr,
                    seed=get_seed(), **sampler_cfg)
                return VariableTimeLoader(split, sampler, mode=mode,
                                          time_window=tw, seed=get_seed(),
                                          global_multiple=gm)

            return (mk(self.data.train, "min", with_repl),
                    mk(self.data.valid, "max", False, ebs),
                    mk(self.data.test, "max", False, ebs))

        kw = dict(batch_size=self.config.batch_size, shuffle=True,
                  seed=get_seed())
        # evaluation has no optimizer state resident and its splits are
        # typically ~10% of train: a larger eval batch (default: the train
        # batch size) cuts per-eval dispatches AND avoids the remainder-
        # batch jit specialization — e.g. a 20-sim split at batch 16 pays
        # TWO test-step compiles (16 and 4); eval_batch_size=20 pays one.
        # Metrics are batch-size-weighted averages, so the value is
        # identical (tests/test_trainer.py::test_eval_batch_size_invariance)
        ekw = dict(kw, batch_size=int(
            getattr(self.config, "eval_batch_size", 0)
            or self.config.batch_size))
        if jax.process_count() > 1:
            # multi-host: per-process input shards assembled into global
            # arrays (parallel.multihost); batches must stay divisible by
            # the mesh's 'data' extent so every batch is shardable
            if self.mesh is None:
                raise ValueError(
                    "multi-host training requires a device mesh: set "
                    "trainer.data_parallel=true (or tensor_parallel=K) — "
                    "without one each process would silently train its "
                    "own divergent model on a disjoint data shard")
            if hasattr(self.sharding, "shard_batch"):
                # multi-host spatial: per-process batch slices assemble
                # into ("data","x") global arrays via
                # parallel.multihost.assemble_global_grid_batch (x-rows
                # never cross a process boundary); validate the layout up
                # front so a bad mesh fails at setup, not mid-epoch
                from nps_tpu.parallel.multihost import \
                    validate_grid_mesh_process_layout

                validate_grid_mesh_process_layout(self.mesh)
            if getattr(self.config, "device_cache", False):
                warnings.warn("device_cache is single-process only; "
                              "falling back to HostDataLoader shards")
            kw["global_multiple"] = dict(self.mesh.shape).get("data", 1)
            ekw["global_multiple"] = kw["global_multiple"]
            return (HostDataLoader(self.data.train, **kw),
                    HostDataLoader(self.data.valid, **ekw),
                    HostDataLoader(self.data.test, **ekw))
        dc = getattr(self.config, "device_cache", False)
        if dc:
            # stage splits into HBM once; per-batch loading becomes an
            # on-device gather (see pipeline.DeviceCacheLoader). eval
            # splits are ~10% the train size each and pay the same
            # per-batch H2D tax every test_interval otherwise.
            #   device_cache_scope="all" (default) -> cache all three
            #     splits; "train" -> train split only (large datasets:
            #     eval stays on the host path so the HBM cache budget
            #     goes to the split read every step)
            #   device_cache_dtype=bfloat16 -> cast float roles before
            #     staging (halves fill H2D + HBM residency; train-step
            #     inputs are cast to compute_dtype anyway)
            from nps_tpu.data.pipeline import DeviceCacheLoader

            scope = str(getattr(self.config, "device_cache_scope", None)
                        or "all").lower()
            cache_dtype = getattr(self.config, "device_cache_dtype",
                                  None) or None
            train_loader = DeviceCacheLoader(
                self.data.train, sharding=self.sharding,
                cache_dtype=cache_dtype, **kw)
            if scope == "train":
                return (train_loader,
                        HostDataLoader(self.data.valid, **ekw),
                        HostDataLoader(self.data.test, **ekw))
            return (train_loader,
                    DeviceCacheLoader(self.data.valid,
                                      sharding=self.sharding, **ekw),
                    DeviceCacheLoader(self.data.test,
                                      sharding=self.sharding, **ekw))
        return (HostDataLoader(self.data.train, **kw),
                HostDataLoader(self.data.valid, **ekw),
                HostDataLoader(self.data.test, **ekw))

    # ------------------------------------------------------------------
    # abstract step contract (parity: trainers/base.py:108-152)
    # ------------------------------------------------------------------
    def train_step(self, batch, epoch, batch_idx, loader):
        """Consume one device batch; update (params, opt_state) in place;
        return (loss_scalar, preds_or_None)."""
        raise NotImplementedError("The method train_step should be implemented!")

    def test_step(self, batch, batch_idx, use_train_loss_calc=False,
                  include_data=False, **kwargs):
        if include_data:
            raise ValueError(
                "include_data is only supported when implemented in test_step")
        if not use_train_loss_calc:
            raise NotImplementedError("The test_step method is not implemented!")
        loss, _ = self.train_step(batch, epoch=0, batch_idx=batch_idx,
                                  loader=None)
        return loss, {}

    def simulate(self, u, *args, **kwargs):
        raise NotImplementedError("The method simulate is not implemented!")

    def __call__(self):
        self.train()

    # ------------------------------------------------------------------
    # training loop (parity: trainers/base.py:219-347)
    # ------------------------------------------------------------------
    def train(self):
        assert self.model.model_interface in self.model_interface, \
            f"{self} does not support model {self.model}."
        assert self.data.data_interface in self.model.data_interface, \
            f"{self.model} does not support data from {self.data}."
        assert self.data.data_interface in self.data_interface, \
            f"{self} does not support data from {self.data}."

        train_loader, valid_loader, test_loader = self.get_dataloaders()
        self.ensure_initialized(train_loader)

        maybe_resumed = self.maybe_resume(train_loader=train_loader)
        if maybe_resumed:
            print(f"Resumed from checkpoint at epoch {self.start_epoch}")

        self._install_preempt_handlers()

        if self.use_wandb:
            wandb.init(config=self.wandb_config_dict, **(self.wandb_kwargs or {}))

        fall_back = False
        train_losses = []
        min_val_loss = {name: float("inf") for name, _ in self.test_kwargs_list}
        # continue best-model tracking across a resume: without this the
        # first post-resume validation would overwrite the best export with
        # a possibly-worse model
        for name, v in getattr(self, "_resumed_min_val_loss", {}).items():
            if name in min_val_loss:
                min_val_loss[name] = v
        val_losses = {name: [] for name, _ in self.test_kwargs_list}
        val_stats_list = {name: [] for name, _ in self.test_kwargs_list}
        time_start = time.perf_counter()
        samples_seen = 0

        profile_dir = getattr(self.config, "profile_dir", None)

        for epoch in range(self.start_epoch, self.config.num_epochs):
            if profile_dir and epoch == self.start_epoch + 1:
                jax.profiler.start_trace(profile_dir)
            train_loss, n_samples = self.train_one_epoch(train_loader, epoch)
            if self._last_epoch_partial or self._preempt_fleet_agreed():
                # a partial epoch's loss is discarded and the checkpoint
                # points at `epoch`, so the resumed run re-runs that epoch
                # (the optimizer steps already applied are kept — recovery
                # is epoch-granular, so those batches may be seen twice);
                # a signal caught in the end-of-epoch callback keeps the
                # completed epoch and resumes at epoch + 1
                partial = self._last_epoch_partial
                if not partial:
                    train_losses.append(train_loss)
                if profile_dir and epoch == self.start_epoch + 1:
                    jax.profiler.stop_trace()
                return self._preempt_exit(epoch + (0 if partial else 1),
                                          min_val_loss, train_loader,
                                          train_losses, val_losses,
                                          val_stats_list)
            samples_seen += n_samples
            train_losses.append(train_loss)
            if profile_dir and epoch == self.start_epoch + 1:
                jax.profiler.stop_trace()

            if (epoch + 1) % self.config.print_interval == 0:
                dt_total = time.perf_counter() - time_start
                if (epoch + 1) % self.config.test_interval == 0:
                    progress = 1.0
                else:
                    nxt = epoch + 1
                    prev_test = nxt - nxt % self.config.test_interval
                    progress = (epoch + 1 - prev_test) / self.config.test_interval
                sps = samples_seen / max(dt_total, 1e-9)
                print(f"Epoch {epoch} (progress: {progress:.2f}, "
                      f"{dt_total:.4f}s, {sps:.1f} samples/s), "
                      f"Loss {util.to_float(train_loss)}")
                time_start = time.perf_counter()
                samples_seen = 0

            epoch_log = {"train_loss": util.to_float(train_loss)}
            if (epoch + 1) % self.config.test_interval == 0:
                for name, test_kwargs in self.test_kwargs_list:
                    print(f"Evaluation on validation dataset for setting "
                          f"[{name}]:")
                    if callable(test_kwargs):
                        val_loss, val_stats = test_kwargs(valid_loader, self)
                    else:
                        try:
                            val_loss, val_stats = self.test(
                                valid_loader, fall_back,
                                test_kwargs=test_kwargs)
                        except NotImplementedError:
                            warnings.warn(
                                "test_step not implemented; falling back to "
                                "training loss for validation!")
                            fall_back = True
                            val_loss, val_stats = self.test(
                                valid_loader, fall_back,
                                test_kwargs=test_kwargs)
                    val_loss = util.to_float(val_loss)
                    print(f"Evaluation metric: {val_loss}")
                    if not self.print_setting.get("print_per_step", False):
                        val_stats = {k: v for k, v in val_stats.items()
                                     if "step" not in k.lower()}
                    stats_f = util.to_floatdict(val_stats)
                    print(util.dict_str(stats_f, prefix="-"))
                    print()

                    epoch_log[name + " - val loss"] = val_loss
                    for k, v in stats_f.items():
                        epoch_log[name + "-" + str(k)] = v

                    val_losses[name].append(val_loss)
                    val_stats_list[name].append(val_stats)
                    if val_loss < min_val_loss[name]:
                        self.save_model(self.config.save_path + f"_{name}")
                        min_val_loss[name] = val_loss
                        print("Found new best model, evaluation on test "
                              "dataset:")
                        if callable(test_kwargs):
                            test_loss, test_stats = test_kwargs(test_loader, self)
                        else:
                            test_loss, test_stats = self.test(
                                test_loader, fall_back, test_kwargs=test_kwargs)
                        print(f"Test metric: {util.to_float(test_loss)}")
                        if not self.print_setting.get("print_per_step", False):
                            test_stats = {k: v for k, v in test_stats.items()
                                          if "step" not in k.lower()}
                        print(util.dict_str(util.to_floatdict(test_stats),
                                            prefix="-"))
                        print()

            # NOT nested in the test_interval block: checkpoint_interval <
            # test_interval must still checkpoint on its own schedule
            # None/absent -> test_interval; 0 disables; int() because a
            # None-default config key reaches the CLI parser untyped
            ckpt_every = getattr(self.config, "checkpoint_interval", None)
            ckpt_every = (self.config.test_interval if ckpt_every is None
                          else int(ckpt_every))
            if ckpt_every and (epoch + 1) % ckpt_every == 0:
                self.save_checkpoint(epoch + 1, min_val_loss,
                                     train_loader=train_loader)

            self._log_metrics_jsonl(epoch, epoch_log)
            if self.use_wandb:
                wandb.log(epoch_log)
            if self._preempt_fleet_agreed():
                # signal arrived during validation/checkpointing: epoch is
                # complete, so the resumed run continues at epoch + 1
                return self._preempt_exit(epoch + 1, min_val_loss,
                                          train_loader, train_losses,
                                          val_losses, val_stats_list)

        self._restore_preempt_handlers()
        self.save_model(self.config.save_path + "_final")
        if self.use_wandb:
            wandb.finish()
        return train_losses, val_losses, val_stats_list

    def train_one_epoch(self, loader, epoch):
        """Parity: ``trainers/base.py:472-507`` (+ device prefetch)."""
        total_loss = jnp.zeros(())
        n_samples = 0
        it = (iter(loader)
              if getattr(loader, "device_resident", False)
              else prefetch_to_device(iter(loader), self.sharding))
        self._last_epoch_partial = False
        for batch_idx, batch in enumerate(it):
            if self._preempt_fleet_agreed():
                # stop at the batch boundary; train() checkpoints + exits
                self._last_epoch_partial = True
                return float(total_loss), n_samples
            loss, _ = self.train_step(batch, epoch, batch_idx, loader=loader)
            bs = util.get_batch_size(batch)
            total_loss = total_loss + loss / bs
            n_samples += bs
            if batch_idx >= self.max_train_batches:
                break
        # verbatim reference semantics (trainers/base.py:496-500): the break
        # is inclusive of batch_idx == max_train_batches and the denominator
        # stays len(loader) even when truncated — max_train_batches is a
        # smoke-test knob, not a production sampler
        total_loss = total_loss / len(loader)

        if self.epoch_callback is not None:
            self.epoch_callback(self, loader, epoch)

        if self.lr_scheduler is not None and self.opt_state is not None:
            if (epoch + 1) % self.config.lr_step_interval == 0:
                self.lr_scheduler.step()
                self.opt_state = optim_lib.set_learning_rate(
                    self.opt_state, self.lr_scheduler.lr)
        return float(total_loss), n_samples

    # ------------------------------------------------------------------
    # evaluation (parity: trainers/base.py:378-470)
    # ------------------------------------------------------------------
    def test(self, loader, use_train_loss_calc=False, include_data=False,
             test_kwargs=None):
        if test_kwargs is None:
            test_kwargs = {}
        self.ensure_initialized(loader)

        loss = 0.0
        other_metrics = {}
        n_total = 0
        data_gt, data_pred, data_other = [], [], []
        it = (iter(loader)
              if getattr(loader, "device_resident", False)
              else prefetch_to_device(iter(loader), self.sharding))
        for batch_idx, batch in enumerate(it):
            out = self.test_step(batch, batch_idx, use_train_loss_calc,
                                 include_data, **test_kwargs)
            if include_data:
                batch_loss, batch_metrics, batch_data = out
            else:
                batch_loss, batch_metrics = out
            bs = util.get_batch_size(batch)
            loss = loss + util.to_float(batch_loss) * bs
            n_total += bs
            for k, v in batch_metrics.items():
                other_metrics[k] = _weighted_add(other_metrics.get(k), v, bs)
            if include_data:
                data_gt.append(np.asarray(batch_data[0]))
                data_pred.append(np.asarray(batch_data[1]))
                data_other.extend(batch_data[2])
            if batch_idx >= self.max_test_batches - 1:
                break
        loss = loss / n_total
        other_metrics = {k: _weighted_div(v, n_total)
                         for k, v in other_metrics.items()}
        if include_data:
            data_gt = np.concatenate(data_gt, axis=0)
            data_pred = np.concatenate(data_pred, axis=0)
            return loss, other_metrics, (np.stack([data_gt, data_pred]),
                                         data_other)
        return loss, other_metrics

    def _log_metrics_jsonl(self, epoch, epoch_log):
        """Append one JSON line per epoch to ``<save_path>_metrics.jsonl``
        — a crash-resilient training-curve record (the end-of-run summary
        pickle and wandb both lose the curve on a hard kill). On resume the
        file keeps appending. Opt-out: ``trainer.metrics_jsonl=False``."""
        if not getattr(self.config, "metrics_jsonl", True) \
                or not self._is_writer_process():
            return
        import json

        path = self.config.save_path + "_metrics.jsonl"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps({"epoch": epoch, **epoch_log}, default=float)
                    + "\n")

    # ------------------------------------------------------------------
    # preemption-safe shutdown (SIGTERM/SIGINT -> checkpoint -> exit)
    # ------------------------------------------------------------------
    def _install_preempt_handlers(self):
        """SIGTERM/SIGINT (cloud preemption notice / operator Ctrl-C) sets
        a flag; the epoch loop stops at the next batch boundary, saves a
        full checkpoint, and returns with ``self.preempted = True``. A
        second signal restores default semantics (KeyboardInterrupt).
        Opt-out: ``trainer.preempt_checkpoint=False``. No-op off the main
        thread (signal.signal raises there)."""
        import signal

        self._orig_handlers = {}
        if not getattr(self.config, "preempt_checkpoint", True):
            return

        # a fresh train() starts un-preempted (a prior preempted run on the
        # same instance must not trip the first batch-boundary check)
        self.preempted = False
        self._preempt_requested = False
        self._last_epoch_partial = False

        def handler(signum, frame):
            if self._preempt_requested:
                self._restore_preempt_handlers()
                raise KeyboardInterrupt
            print(f"[nps_tpu] caught signal {signum}: checkpointing at the "
                  f"next batch boundary, then exiting (signal again to "
                  f"abort immediately)")
            self._preempt_requested = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._orig_handlers[sig] = signal.signal(sig, handler)
            except ValueError:  # not the main thread
                self._orig_handlers = {}
                return

    def _restore_preempt_handlers(self):
        import signal

        for sig, h in getattr(self, "_orig_handlers", {}).items():
            signal.signal(sig, h)
        self._orig_handlers = {}

    def _preempt_fleet_agreed(self):
        """Multi-host: the stop decision must be fleet-wide — staggered
        signal delivery would otherwise leave the un-signalled processes
        blocked inside the next step's collectives forever. Every process
        calls this at every batch boundary (the allgather doubles as the
        sync point); single-process reduces to the local flag."""
        if jax.process_count() == 1:
            return self._preempt_requested
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(self._preempt_requested))
        agreed = bool(np.any(flags))
        if agreed:
            self._preempt_requested = True
        return agreed

    def _preempt_exit(self, epoch, min_val_loss, train_loader,
                      train_losses, val_losses, val_stats_list):
        self.save_checkpoint(epoch, min_val_loss, train_loader=train_loader)
        self.preempted = True
        self._restore_preempt_handlers()
        print(f"Preempted at epoch {epoch}: checkpoint saved — rerun with "
              f"trainer.resume=True to continue")
        if self.use_wandb:
            wandb.finish()
        return train_losses, val_losses, val_stats_list

    # ------------------------------------------------------------------
    # model export + full checkpoint/resume
    # ------------------------------------------------------------------
    @staticmethod
    def _is_writer_process():
        """Multi-host: only process 0 writes checkpoints/exports/metrics
        (concurrent writes to a shared filesystem would race)."""
        return jax.process_index() == 0

    def _host_fetch(self, tree):
        """Fetch a state pytree to host numpy. Multi-host: arrays sharded
        over remote devices (tensor parallelism) are not addressable by
        ``device_get``; gather them fleet-wide first — EVERY process must
        call this (collective), even though only process 0 writes."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            def fetch(x):
                # only remote-sharded jax.Arrays need the collective;
                # replicated arrays / python leaves device_get locally
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    return multihost_utils.process_allgather(x, tiled=True)
                return jax.device_get(x)

            return jax.tree_util.tree_map(fetch, tree)
        return jax.device_get(tree)

    def save_model(self, save_name):
        params = self._host_fetch(self.params)
        if not self._is_writer_process():
            return
        root, ext = os.path.splitext(save_name)
        save_name = root + (ext or ".msgpack")
        os.makedirs(os.path.dirname(save_name) or ".", exist_ok=True)
        with open(save_name, "wb") as f:
            f.write(flax.serialization.to_bytes(params))
        print(f"Saved model at {save_name}")

    def load_model(self, save_name):
        with open(save_name, "rb") as f:
            self.params = flax.serialization.from_bytes(self.params, f.read())

    def _ckpt_path(self):
        return self.config.save_path + "_checkpoint.pkl"

    def save_checkpoint(self, epoch, min_val_loss=None, train_loader=None):
        """Full training state for preemption recovery (absent upstream)."""
        import random as py_random

        params = self._host_fetch(self.params)
        opt_state = self._host_fetch(self.opt_state)
        if not self._is_writer_process():
            return

        state = dict(
            epoch=epoch,
            params=params,
            opt_state=opt_state,
            lr_epoch=self.lr_scheduler.epoch if hasattr(
                self.lr_scheduler, "epoch") else 0,
            min_val_loss=min_val_loss or {},
            np_random=np.random.get_state(),
            py_random=py_random.getstate(),
        )
        # loader shuffle RNG: a resumed run continues the exact epoch
        # permutation sequence instead of replaying from the base seed
        rng = getattr(train_loader, "_rng", None)
        if rng is not None:
            state["loader_rng"] = rng.bit_generator.state
        path = self._ckpt_path()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)
        print(f"Saved checkpoint at {path} (epoch {epoch})")

    def maybe_resume(self, train_loader=None):
        import random as py_random

        if not getattr(self.config, "resume", False):
            return False
        path = self._ckpt_path()
        if not os.path.exists(path):
            return False
        with open(path, "rb") as f:
            state = pickle.load(f)
        # re-place with the trainer's sharding (mirrors init_params): a bare
        # device_put would commit to ONE device and break the parallel
        # step's replicated/sharded-params assumption
        self.params = self._place_state(state["params"])
        if self._zero1():
            from nps_tpu.parallel import shard_opt_state

            self.opt_state = shard_opt_state(state["opt_state"], self.mesh)
        else:
            self.opt_state = self._place_state(state["opt_state"])
        self.start_epoch = state["epoch"]
        self._resumed_min_val_loss = dict(state.get("min_val_loss", {}))
        if train_loader is not None and "loader_rng" in state \
                and getattr(train_loader, "_rng", None) is not None:
            train_loader._rng.bit_generator.state = state["loader_rng"]
        if hasattr(self.lr_scheduler, "epoch"):
            self.lr_scheduler.epoch = state["lr_epoch"]
            self.opt_state = optim_lib.set_learning_rate(
                self.opt_state, self.lr_scheduler.lr)
        np.random.set_state(state["np_random"])
        py_random.setstate(state["py_random"])
        return True
