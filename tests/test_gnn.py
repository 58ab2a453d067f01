"""GNN path: static grid graphs, DataCreator graph API, MPGNN model,
trainer end-to-end.

Oracle strategy (SURVEY.md §4): the reference's graph builders depend on
torch_geometric/torch_cluster (not installed here, and the path is
deprecated upstream) — so the oracles are brute-force numpy neighbor
computations plus grid<->graph round-trip identities against the grid
pipeline, which IS reference-parity-tested elsewhere.
"""

import numpy as np
import pytest

from nps_tpu.common import graph as G
from nps_tpu.common.data_creator import DataCreator
from nps_tpu.pde.base import PDE1D, PDE2D
from nps_tpu.utils.misc import grid_graph_to_array


def _pde1d(nx=16, nt=50, name="CE"):
    return PDE1D(tmin=0.0, tmax=1.0, nt=nt, L=1.0, nx=nx, x=None, name=name)


def _pde2d(nx1=6, nx2=5, nt=40, name="NS"):
    return PDE2D(tmin=0.0, tmax=2.0, nt=nt, L1=1.0, L2=1.0, nx1=nx1, nx2=nx2,
                 x=None, name=name)


# ----------------------------------------------------------------------
# edge builders vs brute force
# ----------------------------------------------------------------------
def test_radius_graph_brute_force(rng):
    pos = rng.normal(size=(30, 2))
    r = 0.8
    edges = G.radius_graph(pos, r)
    have = set(map(tuple, edges.T))
    for i in range(30):
        for j in range(30):
            if i == j:
                continue
            d = np.linalg.norm(pos[i] - pos[j])
            assert ((j, i) in have) == (d <= r)


def test_knn_graph_brute_force(rng):
    pos = rng.normal(size=(25, 2))
    k = 4
    edges = G.knn_graph(pos, k)
    recv_counts = np.bincount(edges[1], minlength=25)
    assert (recv_counts == k).all()
    have = set(map(tuple, edges.T))
    for i in range(25):
        d = np.linalg.norm(pos - pos[i], axis=1)
        d[i] = np.inf
        for j in np.argsort(d)[:k]:
            assert (j, i) in have


def test_edges_sorted_by_receiver_and_batched(rng):
    pos = np.concatenate([rng.normal(size=(10, 1)),
                          rng.normal(size=(10, 1))])
    batch = np.repeat([0, 1], 10)
    edges = G.radius_graph(pos, 1.0, batch=batch)
    assert (np.diff(edges[1]) >= 0).all()
    # no cross-element edges
    assert (edges[0] // 10 == edges[1] // 10).all()


def test_tile_edges_matches_batched_build(rng):
    pos1 = rng.normal(size=(12, 2))
    batch = np.repeat(np.arange(3), 12)
    pos = np.tile(pos1, (3, 1))
    ref = G.radius_graph(pos, 0.9, batch=batch)
    tiled = G.tile_edges(G.radius_graph(pos1, 0.9), 12, 3)
    assert set(map(tuple, ref.T)) == set(map(tuple, tiled.T))


# ----------------------------------------------------------------------
# grid <-> nodes round trip
# ----------------------------------------------------------------------
def test_grid_nodes_roundtrip(rng):
    u = rng.normal(size=(2, 3, 5, 4, 6)).astype(np.float32)
    nodes = G.grid_to_nodes(u)
    assert nodes.shape == (2 * 24, 3, 5)
    back = G.nodes_to_grid(nodes, 2, (4, 6))
    np.testing.assert_array_equal(back, u)


def test_grid_to_nodes_ordering(rng):
    # node ordering must match the reference's flatten(2).permute(2, 0, 1)
    u = rng.normal(size=(2, 1, 2, 3, 4)).astype(np.float32)
    nodes = G.grid_to_nodes(u)
    # element 1, grid cell (i, j) -> node 1*12 + i*4 + j
    np.testing.assert_allclose(nodes[12 + 2 * 4 + 3, 0], u[1, 0, :, 2, 3])


# ----------------------------------------------------------------------
# DataCreator graph API (parity: data_creator.py:80-189)
# ----------------------------------------------------------------------
def test_create_graph_1d(rng):
    pde = _pde1d()
    dc = DataCreator(pde, neighbors=2, time_window=5, t_resolution=pde.nt,
                     x_resolution=pde.nx)
    b, c, tw = 3, 2, 5
    data = rng.normal(size=(b, c, tw, pde.nx)).astype(np.float32)
    labels = rng.normal(size=(b, c, tw, pde.nx)).astype(np.float32)
    x = np.tile(pde.x[None], (b, 1))
    cond = rng.normal(size=(b, 4)).astype(np.float32)
    steps = [5, 10, 15]
    g = dc.create_graph(data, labels, x, cond, steps)

    assert g.nodes.shape == (b * pde.nx, c, tw)
    assert g.y.shape == (b * pde.nx, c, tw)
    assert g.pos.shape == (b * pde.nx, 2)
    # t column = t[step] per element
    t = np.linspace(pde.tmin, pde.tmax, pde.nt)
    np.testing.assert_allclose(g.pos[:pde.nx, 0], t[5], rtol=1e-6)
    np.testing.assert_allclose(g.pos[pde.nx:2 * pde.nx, 0], t[10], rtol=1e-6)
    # per-node conditioning gathers the element's vector
    np.testing.assert_array_equal(g.cond[pde.nx + 1], cond[1])
    # radius rule: interior nodes have 2*n neighbors
    deg = np.bincount(g.edge_index[1], minlength=b * pde.nx)
    assert deg[2 * pde.nx + 8] == 4  # interior node of element 2
    assert deg[0] == 2               # boundary node


def test_create_next_graph_rolls_window(rng):
    pde = _pde1d()
    tw = 5
    dc = DataCreator(pde, neighbors=2, time_window=tw, t_resolution=pde.nt,
                     x_resolution=pde.nx)
    b, c = 2, 1
    u = rng.normal(size=(b, c, pde.nt, pde.nx)).astype(np.float32)
    x = np.tile(pde.x[None], (b, 1))
    steps = [10, 20]
    data, labels = dc.create_data(u, steps)
    g = dc.create_graph(data, labels, x, None, steps)

    pred = G.grid_to_nodes(labels)  # perfect prediction
    steps2 = [s + tw for s in steps]
    _, labels2 = dc.create_data(u, steps2)
    g2 = dc.create_next_graph(g, pred, labels2, steps2)

    # new input window == the prediction (old labels)
    np.testing.assert_array_equal(g2.nodes, pred)
    np.testing.assert_array_equal(g2.y, G.grid_to_nodes(labels2))
    t = np.linspace(pde.tmin, pde.tmax, pde.nt)
    np.testing.assert_allclose(g2.pos[: pde.nx, 0], t[15], rtol=1e-6)
    np.testing.assert_array_equal(g2.pos[:, 1:], g.pos[:, 1:])


def test_create_graph_2d_edge_rule(rng):
    pde = _pde2d()
    dc = DataCreator(pde, neighbors=1, time_window=3, t_resolution=pde.nt,
                     x_resolution=pde.nx1)
    b = 2
    nx = pde.nx1 * pde.nx2
    data = rng.normal(size=(b, 1, 3, pde.nx1, pde.nx2)).astype(np.float32)
    x = np.tile(pde.x[None], (b, 1, 1, 1))
    g = dc.create_graph(data, data, x, None, [3, 6])
    # edge rule: radius n*hypot(dx1, dx2) + 1e-4 pad (deterministic
    # inclusion of the exact-boundary diagonal neighbors — see
    # graph.grid_edges docstring) — verify against brute force
    pos = G.flat_positions(pde.x)
    r = 1 * np.hypot(pde.dx1, pde.dx2) + 1e-4
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    expected_per_el = int((d <= r).sum())
    assert g.edge_index.shape[1] == b * expected_per_el
    # interior nodes see all 8 neighbors (4 axial + 4 exact-boundary
    # diagonal) — the determinism the pad buys
    recv_all = g.edge_index[1]
    deg = np.bincount(recv_all, minlength=b * nx)
    interior = deg.reshape(b, pde.nx1, pde.nx2)[:, 1:-1, 1:-1]
    assert (interior == 8).all()
    # and every edge respects the radius
    send, recv = g.edge_index[0] % nx, g.edge_index[1] % nx
    assert (np.linalg.norm(pos[send] - pos[recv], axis=1) <= r + 1e-6).all()


# ----------------------------------------------------------------------
# grid_graph_to_array (parity: misc.py:74-113)
# ----------------------------------------------------------------------
def test_grid_graph_to_array_roundtrip(rng):
    pde = _pde2d()
    dc = DataCreator(pde, neighbors=1, time_window=4, t_resolution=pde.nt,
                     x_resolution=pde.nx1)
    b, c, tw = 2, 3, 4
    data = rng.normal(size=(b, c, tw, pde.nx1, pde.nx2)).astype(np.float32)
    x = np.tile(pde.x[None], (b, 1, 1, 1))
    g = dc.create_graph(data, data, x, None, [4, 8])
    img = grid_graph_to_array(g.nodes, g.pos, g.batch, pde.dxs)
    np.testing.assert_allclose(img, data, rtol=1e-6)


# ----------------------------------------------------------------------
# model + trainer end to end
# ----------------------------------------------------------------------
def _gnn_model(pde, num_c=1, tw=5, nd=1, hidden=16):
    from nps_tpu.models import build_enc_proc_dec

    return build_enc_proc_dec(
        pde=pde,
        encoder={"object": "gnn.NodeElementWise"},
        processor={"object": "MPGNN", "hidden_blocks": 2},
        decoder={"object": "gnn.NodeTimeConvDense"},
        num_c=num_c, num_spatial_dims=nd, time_window=tw,
        data_structure="graph", hidden_features=hidden)


def test_gnn_forward_shapes(rng):
    import jax

    pde = _pde1d(name="CE")
    pde.n_cond_static = 2
    dc = DataCreator(pde, neighbors=2, time_window=5, t_resolution=pde.nt,
                     x_resolution=pde.nx)
    b, c, tw = 2, 1, 5
    u = rng.normal(size=(b, c, pde.nt, pde.nx)).astype(np.float32)
    x = np.tile(pde.x[None], (b, 1))
    cond = rng.normal(size=(b, 2)).astype(np.float32)
    data, labels = dc.create_data(u, [10, 20])
    g = dc.create_graph(data, labels, x, cond, [10, 20])

    model = _gnn_model(pde, num_c=c, tw=tw)
    assert f"{model.model_interface}" == "M.AR_TB_GNN"
    params = model.init(jax.random.PRNGKey(0), g, cond=cond)
    out = jax.jit(lambda p, g_, c_: model.apply(p, g_, cond=c_))(
        params, g, cond)
    assert out.shape == (b * pde.nx, c, tw)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture
def gnn_trainer(rng, tmp_path):
    """Tiny 1D CE dataset + GNN trainer."""
    from nps_tpu.train.pushforward import AutoregressivePushforwardTrainer
    from nps_tpu.train.losses import build_criterion
    from nps_tpu.utils.dataset_adapter import DatasetToInterface
    from nps_tpu.common.interfaces import D

    pde = _pde1d(nx=12, nt=40, name="CE")
    n = 6
    u = rng.normal(size=(n, 1, pde.nt, pde.nx)).astype(np.float32) * 0.1
    x = np.tile(pde.x[None], (n, 1)).astype(np.float32)
    empty = np.zeros((0,), np.float32)
    items = [(np.zeros(0, np.float32), u[i], x[i], empty, empty, empty)
             for i in range(n)]
    data = DatasetToInterface(items, D.sim1d, set_as="all", pde=pde)

    tw = 5
    model = _gnn_model(pde, num_c=1, tw=tw, hidden=12)
    trainer = AutoregressivePushforwardTrainer(
        model=model, data=data,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3),
        lr_scheduler=dict(object="optim.lr_scheduler.MultiStepLR",
                          milestones=[1], gamma=0.4),
        save_path=str(tmp_path / "m"),
        time_window=tw, base_resolution=(pde.nt, pde.nx),
        super_resolution=(pde.nt, pde.nx), device="cpu", batch_size=3,
        num_epochs=2, lr_step_interval=25, unrolling=1, test_interval=1,
        nr_gt_steps=1, neighbors=2, print_interval=1, nw=0,
        process_settings={})
    return trainer


def test_gnn_trainer_end_to_end(gnn_trainer):
    trainer = gnn_trainer
    train_loader, valid_loader, _ = trainer.get_dataloaders()
    trainer.ensure_initialized(train_loader)
    batch = next(iter(train_loader))
    # fixed (epoch, batch_idx) -> deterministic windows: repeated steps on
    # the same batch must reduce the training loss
    losses = [float(trainer.train_step(batch, 0, 0, train_loader)[0])
              for _ in range(8)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    main_loss, info = trainer.test_step(next(iter(valid_loader)), 0)
    assert np.isfinite(main_loss)
    assert "Mean per-step loss" in info


def test_gnn_cli_end_to_end(tmp_path):
    """The GNN config trains end to end through the real CLI."""
    import sys

    from nps_tpu.configs.parse import parse_args
    from nps_tpu.data.synthetic import generate
    from nps_tpu.train_cli import main

    d = tmp_path / "twophase"
    generate(str(d), n_sims=6, n_channels=7, nt=21, nx1=8, nx2=6, seed=3)
    old = sys.argv
    try:
        sys.argv = [
            "prog", "-C", "nps_tpu/configs/train/cfg_twophase_gnn.py",
            "--base_resolution=[21,8,6]", "--super_resolution=[21,8,6]",
            "--time_window=5", "--batch_size=2",
            f"--dataset.base_path={tmp_path}",
            "--model.hidden_features=8", "--model.hidden_blocks=1",
            "--trainer.num_epochs=1", "--trainer.test_interval=1",
            "--trainer.max_train_batches=2", "--trainer.device=cpu",
            f"--experiment_path={tmp_path / 'out'}",
            "--experiment_name=gnn_smoke",
        ]
        args = parse_args()
    finally:
        sys.argv = old
    main(args)
    assert (tmp_path / "out" / "gnn_smoke_train_summary.pickle").exists()


def test_gnn_surrogate_engine(rng):
    """Serving: a GNN config builds, inits, and rolls out via the engine."""
    from nps_tpu.inference import SurrogateEngine

    pde = _pde2d(nx1=10, nx2=8, nt=41, name="twophase")
    pde.n_cond_static = 2
    tw = 5
    eng = SurrogateEngine.from_config(
        "nps_tpu/configs/train/cfg_twophase_gnn.py", pde=pde,
        overrides=["--model.hidden_features=8", "--model.hidden_blocks=1",
                   "--time_window=5", "--base_resolution=[41,10,8]"])
    assert eng._is_gnn()
    u0 = (rng.random((2, 1, tw, 10, 8)) * 0.9).astype(np.float32)
    cond = rng.random((2, 2)).astype(np.float32)
    eng.init_params(u0, cond=cond)
    out = eng.rollout(u0, n_steps=3, cond=cond)
    assert out.shape == (2, 1, 3 * tw, 10, 8)
    assert np.isfinite(out).all()
    # rollout == step loop
    p1 = eng.step(u0, cond=cond)
    np.testing.assert_allclose(out[:, :, :tw], p1, rtol=1e-4, atol=1e-5)


def test_gnn_simulate_rollout(gnn_trainer, rng):
    trainer = gnn_trainer
    trainer.ensure_initialized(trainer.get_dataloaders()[0])
    pde = trainer.data.pde
    b = 2
    u = rng.normal(size=(b, 1, pde.nt, pde.nx)).astype(np.float32) * 0.1
    x = np.tile(pde.x[None], (b, 1)).astype(np.float32)
    losses = trainer.simulate(
        u, None, x, compute_loss=True, include_data=False, nr_gt_steps=1,
        t_res=pde.nt)
    assert len(losses) == (pde.nt - trainer.tw + 1 - trainer.tw) // trainer.tw + 1
    assert np.isfinite(losses).all()


def test_mpgnn_edge_chunks_match_unchunked(rng):
    """edge_chunks=K computes the same output/grads as the one-shot path
    (per-slice segment_sums of receiver-sorted edges add up exactly,
    modulo float association)."""
    import jax
    import jax.numpy as jnp

    from nps_tpu.models.gnn import MPGNN

    n, hidden = 30, 8
    pos = rng.random((n, 2)).astype(np.float32)
    edges = G.radius_graph(pos, 0.4)
    h = rng.random((n, hidden)).astype(np.float32)
    m1 = MPGNN(hidden_features=hidden, hidden_blocks=2)
    mk = MPGNN(hidden_features=hidden, hidden_blocks=2, edge_chunks=5,
               remat=True)
    params = m1.init(jax.random.PRNGKey(0), h, pos=jnp.asarray(pos),
                     edge_index=jnp.asarray(edges))
    out1 = m1.apply(params, h, pos=pos, edge_index=edges)
    outk = mk.apply(params, h, pos=pos, edge_index=edges)
    np.testing.assert_allclose(np.asarray(outk), np.asarray(out1),
                               rtol=1e-5, atol=1e-6)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, h, pos=pos,
                                         edge_index=edges) ** 2)

    g1 = jax.grad(loss(m1))(params)
    gk = jax.grad(loss(mk))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_grid_meta_roll_path_matches_gather():
    """The shifted-grid message-passing fast path must equal the
    gather/segment_sum path bit-for-bit in f32 (same params, same graph)."""
    import jax
    import jax.numpy as jnp

    from nps_tpu.common import graph as G
    from nps_tpu.models.gnn import MPGNN
    from nps_tpu.pde import PDE2D

    nx1, nx2, b, c = 12, 10, 3, 16
    pde = PDE2D(tmin=0, tmax=1, nt=11, L1=1.0, L2=0.8, nx1=nx1, nx2=nx2,
                x=None, name="NS", n_cond_static=0)
    edges, pos_n, batch, meta = G.build_static_structure(
        pde, pde.x, neighbors=2, batch_size=b)
    assert meta is not None, "regular grid must be offset-structured"
    sp, offsets, deltas = meta
    assert sp == (nx1, nx2)

    m = MPGNN(hidden_features=c, hidden_blocks=2, num_spatial_dims=2)
    rng = np.random.default_rng(3)
    h = rng.standard_normal((b * nx1 * nx2, c)).astype(np.float32)
    pos = pos_n[:, 1:]
    params = m.init(jax.random.PRNGKey(0), h, pos=pos, edge_index=edges)

    out_gather = jax.jit(
        lambda p, h: m.apply(p, h, pos=pos, edge_index=edges))(params, h)
    out_roll = jax.jit(
        lambda p, h: m.apply(p, h, pos=pos, edge_index=edges,
                             grid_meta=meta))(params, h)
    np.testing.assert_allclose(np.asarray(out_roll), np.asarray(out_gather),
                               rtol=2e-5, atol=2e-6)


def test_grid_offset_structure_rejects_knn_ties():
    """knn graphs (WE rule) are not offset-structured when k breaks grid
    symmetry; the recognizer must return None rather than mis-structure."""
    from nps_tpu.common import graph as G
    from nps_tpu.pde import PDE1D

    pde = PDE1D(tmin=0, tmax=1, nt=11, L=1.0, nx=16, x=None, name="WE",
                n_cond_static=0)
    ei = G.grid_edges(pde, pde.x, 3)  # k=3: one-sided tie-break somewhere
    meta = G.grid_offset_structure(pde.x, ei)
    assert meta is None


def test_radius_graph_neighbor_cap_excludes_self():
    """max_num_neighbors must not spend a slot on the zero-distance self
    column (regression: node 0 of a collinear chain got k-1 neighbors)."""
    from nps_tpu.common.graph import radius_graph

    pos = np.arange(5, dtype=np.float64)[:, None]
    send, recv = radius_graph(pos, r=10.0, max_num_neighbors=2)
    deg = np.bincount(recv, minlength=5)
    assert (deg == 2).all(), deg
    # the cap keeps the lowest-index senders (torch_cluster order)
    assert sorted(send[recv == 0].tolist()) == [1, 2]
    assert sorted(send[recv == 4].tolist()) == [0, 1]
