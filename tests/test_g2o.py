"""g2o dataset IO + full-matrix edge sqrt-information.

Covers the io.g2o reader/writer/loader round trip, the information ->
sqrt-information conversion, full (6,6)/(3,3) whitening through the
closed-form edge Jacobians (vs the autodiff oracle), diagonal/matrix
equivalence of full solves, and EXACT objective parity with the g2o
error convention (the loader's documented contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.core.pose import (
    Pose,
    np_quat_to_rotmat,
)
from nonlinear_optimizer_for_slam_tpu.io import g2o as g2o_io
from nonlinear_optimizer_for_slam_tpu.ops import relative_pose as rp
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    PoseGraph2DEdges,
    PoseGraphOptimizer,
    PoseGraphOptimizer2D,
    se2_edge_residuals_and_jacobians,
    sqrt_info_from_information,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def random_spd(rng, n, scale=1.0):
    a = rng.normal(size=(n, n))
    return scale * (a @ a.T + n * np.eye(n))


# ---------------------------------------------------------------------------
# sqrt_info_from_information
# ---------------------------------------------------------------------------


def test_sqrt_info_from_information_roundtrip(rng):
    for n in (3, 6):
        omega = random_spd(rng, n, 7.3)
        s = sqrt_info_from_information(omega)
        np.testing.assert_allclose(s.T @ s, omega, rtol=1e-12, atol=1e-9)
        # upper triangular on the PD path
        assert np.allclose(s, np.triu(s))


def test_sqrt_info_from_information_semidefinite(rng):
    # rank-2 PSD: cholesky fails, eigh fallback must still factor it
    v = rng.normal(size=(6, 2))
    omega = v @ v.T
    s = sqrt_info_from_information(omega)
    np.testing.assert_allclose(s.T @ s, omega, atol=1e-10)


# ---------------------------------------------------------------------------
# full-matrix whitening through the closed-form Jacobians
# ---------------------------------------------------------------------------


def _random_graph_arrays(rng, P=6, E=9):
    pos = rng.normal(size=(P, 3))
    quat = rng.normal(size=(P, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    ref = rng.integers(0, P, E).astype(np.int32)
    qry = (ref + 1 + rng.integers(0, P - 1, E).astype(np.int32)) % P
    rel_t = rng.normal(size=(E, 3))
    rel_q = rng.normal(size=(E, 4))
    rel_q /= np.linalg.norm(rel_q, axis=1, keepdims=True)
    is_loop = (rng.random(E) < 0.5).astype(float)
    sw = rng.uniform(0.2, 1.0, E)
    return pos, quat, ref, qry, rel_t, rel_q, is_loop, sw


def test_matrix_sqrt_info_closed_form_vs_autodiff(rng):
    pos, quat, ref, qry, rel_t, rel_q, is_loop, sw = _random_graph_arrays(rng)
    E = len(ref)
    S = np.stack([sqrt_info_from_information(random_spd(rng, 6)) for _ in range(E)])
    edges = rp.PoseGraphEdges(
        jnp.asarray(ref), jnp.asarray(qry), jnp.asarray(rel_t),
        jnp.asarray(rel_q), jnp.asarray(is_loop), jnp.ones(E),
        sqrt_info=jnp.asarray(S),
    )
    args = (jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(sw), edges, 0.03)
    out = rp.edge_residuals_and_jacobians(*args)
    ora = rp.edge_residuals_and_jacobians_ad(*args)
    for a, b in zip(out, ora):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    # numpy twin agrees too
    twin = rp.np_edge_residuals_and_jacobians(
        pos, quat, sw, ref, qry, rel_t, rel_q, is_loop, 0.03, sqrt_info=S
    )
    for a, b in zip(twin, out):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-10)


def test_diag_matrix_equivalence_full_solve(rng):
    """diag(w) passed as a (6,6) matrix == (6,) vector, end to end."""
    w = rng.uniform(0.5, 2.0, 6)
    true = [Pose.from_axis_angle(0.1 * k, [0, 0, 1], [float(k), 0.0, 0.0])
            for k in range(6)]

    def build(si):
        opt = PoseGraphOptimizer()
        rng_local = np.random.default_rng(7)
        for k, p in enumerate(true):
            n = Pose(p.rotation, p.translation + (0 if k == 0 else rng_local.normal(0, 0.05, 3)))
            opt.set_pose(k, n)
        opt.set_pose_constant(0)
        for k in range(5):
            opt.set_constraint(k, k + 1, true[k].inverse() * true[k + 1], sqrt_info=si)
        opt.set_constraint(0, 5, true[0].inverse() * true[5], sqrt_info=si)
        return opt

    o_vec = build(w)
    o_mat = build(np.diag(w))
    s_vec, _ = o_vec.solve()
    s_mat, _ = o_mat.solve()
    np.testing.assert_allclose(
        float(s_vec.final_cost), float(s_mat.final_cost), rtol=1e-9
    )
    for k in range(6):
        np.testing.assert_allclose(
            o_vec.get_pose(k).translation, o_mat.get_pose(k).translation, atol=1e-8
        )


# ---------------------------------------------------------------------------
# g2o parsing / writing
# ---------------------------------------------------------------------------

G2O_3D = """\
# toy 3-D graph
VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1
VERTEX_SE3:QUAT 1 1 0 0 0 0 0.0998334 0.9950042
EDGE_SE3:QUAT 0 1 1 0 0 0 0 0.0998334 0.9950042 100 0 0 0 0 0 100 0 0 0 0 100 0 0 0 400 0 0 400 0 400
FIX 0
"""

G2O_2D = """\
VERTEX_SE2 0 0 0 0
VERTEX_SE2 1 1 0 0.2
EDGE_SE2 0 1 1 0 0.2 50 0 0 50 0 100
"""


def test_read_g2o_3d(tmp_path):
    p = tmp_path / "toy.g2o"
    p.write_text(G2O_3D)
    g = g2o_io.read_g2o(str(p))
    assert g.dim == 3 and len(g.vertices) == 2 and len(g.edges) == 1
    assert g.fixed == {0}
    # quaternion reordered to wxyz
    np.testing.assert_allclose(g.vertices[1][3], 0.9950042)
    e = g.edges[0]
    assert (e.i, e.j) == (0, 1)
    assert e.information.shape == (6, 6)
    np.testing.assert_allclose(np.diag(e.information), [100] * 3 + [400] * 3)
    np.testing.assert_allclose(e.information, e.information.T)


def test_read_g2o_2d(tmp_path):
    p = tmp_path / "toy2d.g2o"
    p.write_text(G2O_2D)
    g = g2o_io.read_g2o(str(p))
    assert g.dim == 2 and len(g.vertices) == 2 and len(g.edges) == 1
    np.testing.assert_allclose(
        g.edges[0].information, [[50, 0, 0], [0, 50, 0], [0, 0, 100]]
    )


def test_read_g2o_errors(tmp_path):
    p = tmp_path / "bad.g2o"
    p.write_text("VERTEX_SE2 0 0 0 0\nVERTEX_SE3:QUAT 1 0 0 0 0 0 0 1\n")
    with pytest.raises(ValueError, match="mixed"):
        g2o_io.read_g2o(str(p))
    p.write_text("EDGE_SE2 0 1 nope 0 0 1 0 0 1 0 1\n")
    with pytest.raises(ValueError, match="malformed"):
        g2o_io.read_g2o(str(p))
    p.write_text("# only comments\nUNKNOWN_TAG 1 2 3\n")
    with pytest.raises(ValueError, match="no pose-graph records"):
        g2o_io.read_g2o(str(p))


def test_write_read_roundtrip(tmp_path, rng):
    g = g2o_io.G2oGraph(dim=3)
    for k in range(4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        g.vertices[k] = np.concatenate([rng.normal(size=3), q])
    for k in range(3):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        g.edges.append(
            g2o_io.G2oEdge(k, k + 1, np.concatenate([rng.normal(size=3), q]),
                           random_spd(rng, 6))
        )
    g.fixed.add(0)
    path = str(tmp_path / "rt.g2o")
    g2o_io.write_g2o(path, g)
    g2 = g2o_io.read_g2o(path)
    assert g2.dim == 3 and g2.fixed == {0}
    for k in g.vertices:
        np.testing.assert_allclose(g2.vertices[k], g.vertices[k], rtol=1e-6)
    for a, b in zip(g.edges, g2.edges):
        np.testing.assert_allclose(b.measurement, a.measurement, rtol=1e-6)
        np.testing.assert_allclose(b.information, a.information, rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------------
# loader objective parity with the g2o error convention
# ---------------------------------------------------------------------------


def _se2_compose(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array(
        [a[0] + c * b[0] - s * b[1], a[1] + s * b[0] + c * b[1], a[2] + b[2]]
    )


def _se2_between(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    dth = b[2] - a[2]
    return np.array([c * dx + s * dy, -s * dx + c * dy,
                     np.arctan2(np.sin(dth), np.cos(dth))])


def _write_2d_graph(path, verts, edges):
    g = g2o_io.G2oGraph(dim=2)
    for k, v in enumerate(verts):
        g.vertices[k] = np.asarray(v, np.float64)
    for (i, j, meas, info) in edges:
        g.edges.append(g2o_io.G2oEdge(i, j, np.asarray(meas), np.asarray(info)))
    g2o_io.write_g2o(path, g)


def test_se2_loader_objective_matches_g2o_exactly(tmp_path, rng):
    """Initial whitened cost == sum e_g2o^T Omega e_g2o for FULL random
    SPD information (the R_rel^T fold makes SE(2) exact)."""
    P = 8
    verts = [np.array([np.cos(t), np.sin(t), t + 0.1 * rng.normal()])
             for t in np.linspace(0, 2, P)]
    edges = []
    for k in range(P - 1):
        meas = _se2_between(verts[k], verts[k + 1]) + rng.normal(0, 0.05, 3)
        edges.append((k, k + 1, meas, random_spd(rng, 3)))
    edges.append((0, P - 1, _se2_between(verts[0], verts[P - 1]) + rng.normal(0, 0.05, 3),
                  random_spd(rng, 3)))
    path = str(tmp_path / "se2.g2o")
    _write_2d_graph(path, verts, edges)

    opt = g2o_io.load_pose_graph(path)
    assert isinstance(opt, PoseGraphOptimizer2D)

    # hand-computed g2o objective at the initial estimates — from the
    # RE-PARSED file (the writer keeps 9 significant digits)
    parsed = g2o_io.read_g2o(path)
    verts = [parsed.vertices[k] for k in range(P)]
    edges = [(e.i, e.j, e.measurement, e.information) for e in parsed.edges]
    want = 0.0
    for (i, j, meas, info) in edges:
        d = _se2_between(verts[i], verts[j])
        c, s = np.cos(meas[2]), np.sin(meas[2])
        e_t = np.array([[c, s], [-s, c]]) @ (d[:2] - meas[:2])
        e_th = np.arctan2(np.sin(d[2] - meas[2]), np.cos(d[2] - meas[2]))
        e = np.array([e_t[0], e_t[1], e_th])
        want += float(e @ info @ e)

    # framework cost at the initial estimates via the edge machinery
    csts = opt.constraints()
    E = len(csts)
    w3 = rp.stack_sqrt_info([c["sqrt_info"] for c in csts], 3)
    dev = PoseGraph2DEdges(
        jnp.asarray([c["reference_index"] for c in csts], jnp.int32),
        jnp.asarray([c["query_index"] for c in csts], jnp.int32),
        jnp.asarray(np.stack([c["relative_xyt"] for c in csts])),
        jnp.zeros(E), jnp.ones(E), sqrt_info=jnp.asarray(w3),
    )
    r, *_ = se2_edge_residuals_and_jacobians(
        jnp.asarray(np.stack(verts)), jnp.zeros(E), dev, 0.0
    )
    got = float(jnp.sum(r * r))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_se3_loader_objective_matches_g2o_block_isotropic(tmp_path, rng):
    """Initial whitened cost == g2o objective when the translation info
    block is isotropic and there are no t-r cross terms (the documented
    exactness domain; standard datasets look like this)."""
    P = 6
    true = [Pose.from_axis_angle(0.3 * k, [0, 0, 1], [np.cos(0.3 * k), np.sin(0.3 * k), 0.1 * k])
            for k in range(P)]
    g = g2o_io.G2oGraph(dim=3)
    infos, meas_list, pairs = [], [], []
    for k, p in enumerate(true):
        t = p.translation + rng.normal(0, 0.05, 3)
        g.vertices[k] = np.concatenate([t, p.quaternion()])
    for k in range(P - 1):
        pairs.append((k, k + 1))
    pairs.append((0, P - 1))
    for (i, j) in pairs:
        rel = true[i].inverse() * true[j]
        qn = rel.quaternion() + rng.normal(0, 0.01, 4)
        qn /= np.linalg.norm(qn)
        trel = rel.translation + rng.normal(0, 0.03, 3)
        meas = np.concatenate([trel, qn])
        info = np.zeros((6, 6))
        info[:3, :3] = rng.uniform(50, 200) * np.eye(3)
        info[3:, 3:] = random_spd(rng, 3, 30.0)
        g.edges.append(g2o_io.G2oEdge(i, j, meas, info))
        infos.append(info)
        meas_list.append(meas)
    path = str(tmp_path / "se3.g2o")
    g2o_io.write_g2o(path, g)

    opt = g2o_io.load_pose_graph(path)
    assert isinstance(opt, PoseGraphOptimizer)

    # hand-computed g2o objective from the RE-PARSED file (the writer
    # keeps 9 significant digits): e = [R_rel^T R_i^T ((p_j-p_i) -
    # R_i t_rel); vec(q_rel^-1 q_i^-1 q_j)]
    def qmul(a, b):
        return rp.np_quat_multiply(a, b)

    parsed = g2o_io.read_g2o(path)
    verts = {k: parsed.vertices[k] for k in parsed.vertices}
    meas_list = [e.measurement for e in parsed.edges]
    infos = [e.information for e in parsed.edges]
    def unit(q):
        return q / np.linalg.norm(q)

    want = 0.0
    for (i, j), meas, info in zip(pairs, meas_list, infos):
        vi, vj = verts[i], verts[j]
        qi, qj, qm = unit(vi[3:]), unit(vj[3:]), unit(meas[3:])
        Ri = np_quat_to_rotmat(qi)
        Rrel = np_quat_to_rotmat(qm)
        e_t = Rrel.T @ Ri.T @ ((vj[:3] - vi[:3]) - Ri @ meas[:3])
        q_err = qmul(rp.np_quat_conjugate(qm), qmul(rp.np_quat_conjugate(qi), qj))
        e = np.concatenate([e_t, q_err[1:]])
        want += float(e @ info @ e)

    flat = opt._flatten()
    pos, quat = opt._packed(flat["indices"], flat["index_of"])
    r = rp.edge_residuals(
        jnp.asarray(pos), jnp.asarray(quat),
        jnp.ones(flat["E"]), flat["edges_dev"], 0.0,
    )
    got = float(jnp.sum(r * r))
    np.testing.assert_allclose(got, want, rtol=1e-10)


# ---------------------------------------------------------------------------
# end-to-end load -> solve -> save
# ---------------------------------------------------------------------------


def test_load_solve_save_3d(tmp_path, rng):
    """Noisy 3-D loop graph from disk: solve shrinks the objective and
    recovers the ground truth; saved file round-trips the solution."""
    P = 12
    true = [Pose.from_axis_angle(2 * np.pi * k / P, [0, 0, 1],
                                 [np.cos(2 * np.pi * k / P), np.sin(2 * np.pi * k / P), 0.0])
            for k in range(P)]
    g = g2o_io.G2oGraph(dim=3)
    for k, p in enumerate(true):
        t = p.translation + (rng.normal(0, 0.08, 3) if k else 0.0)
        g.vertices[k] = np.concatenate([t, p.quaternion()])
    info = np.zeros((6, 6))
    info[:3, :3] = 100 * np.eye(3)
    info[3:, 3:] = 400 * np.eye(3)
    for k in range(P):
        i, j = k, (k + 1) % P
        rel = true[i].inverse() * true[j]
        g.edges.append(
            g2o_io.G2oEdge(i, j, np.concatenate([rel.translation, rel.quaternion()]), info)
        )
    src = str(tmp_path / "loop.g2o")
    g2o_io.write_g2o(src, g)

    opt = g2o_io.load_pose_graph(src)
    summary, _ = opt.solve(Options().replace(max_iterations=100))
    for k in range(P):
        np.testing.assert_allclose(
            opt.get_pose(k).translation, true[k].translation, atol=2e-2
        )

    dst = str(tmp_path / "solved.g2o")
    g2o_io.save_pose_graph(dst, opt, graph=g)
    g2 = g2o_io.read_g2o(dst)
    assert len(g2.edges) == P  # original edges preserved
    np.testing.assert_allclose(g2.edges[0].information, info, rtol=1e-6)
    for k in range(P):
        np.testing.assert_allclose(
            g2.vertices[k][:3], opt.get_pose(k).translation, atol=1e-6
        )
    # save without the source graph reconstructs edges (unit info)
    dst2 = str(tmp_path / "bare.g2o")
    g2o_io.save_pose_graph(dst2, opt)
    g3 = g2o_io.read_g2o(dst2)
    assert len(g3.edges) == P and len(g3.vertices) == P


def test_load_switchable_loops_2d(tmp_path, rng):
    """loop_closure_gap classification + switchable outlier rejection on
    a file-borne 2-D graph with one FALSE loop closure."""
    P = 20
    verts = []
    x = np.zeros(3)
    for k in range(P):
        verts.append(x.copy())
        x = _se2_compose(x, [1.0, 0.0, 2 * np.pi / P])
    edges = []
    info = np.diag([100.0, 100.0, 400.0])
    for k in range(P - 1):
        edges.append((k, k + 1, _se2_between(verts[k], verts[k + 1]), info))
    edges.append((0, P - 1, _se2_between(verts[0], verts[P - 1]), info))  # true loop
    edges.append((3, 13, np.array([5.0, 5.0, 1.0]), info))  # FALSE loop
    path = str(tmp_path / "sw.g2o")
    noisy = [v + np.concatenate([rng.normal(0, 0.05, 2), [rng.normal(0, 0.02)]])
             if k else v for k, v in enumerate(verts)]
    _write_2d_graph(path, noisy, edges)

    opt = g2o_io.load_pose_graph(path, switchable_loops=True)
    summary, switches = opt.solve(Options().replace(max_iterations=200))
    # two loop edges -> two switches; the planted false one turns off
    assert len(switches) == 2
    assert switches[1] < 0.3 and switches[0] > 0.7
    for k in range(P):
        np.testing.assert_allclose(opt.get_pose(k)[:2], verts[k][:2], atol=0.15)


def test_sphere_world_g2o_solve(tmp_path):
    """sphere2500-style world (spiral sphere, ring loop closures,
    dead-reckoned drifted init) at reduced scale through the FULL file
    path: generate -> write -> load -> solve -> big error reduction."""
    from nonlinear_optimizer_for_slam_tpu.utils import testing as tu

    g, gt = tu.generate_sphere_g2o(n_rings=8, per_ring=25, radius=20.0)
    assert len(g.vertices) == 200 and len(g.edges) == 374
    init_err = max(np.linalg.norm(g.vertices[k][:3] - gt[k]) for k in g.vertices)
    assert init_err > 1.0  # the dead-reckoned init really is drifted

    path = str(tmp_path / "sphere.g2o")
    g2o_io.write_g2o(path, g)
    opt = g2o_io.load_pose_graph(path)
    summary, _ = opt.solve(Options().replace(max_iterations=100))
    assert bool(summary.converged)
    err = max(np.linalg.norm(opt.get_pose(k).translation - gt[k])
              for k in range(len(gt)))
    assert err < 0.15 * init_err


def test_landmark_slam_g2o_roundtrip_and_solve(tmp_path, rng):
    """VERTEX_TRACKXYZ / EDGE_SE3_TRACKXYZ records: write -> read ->
    PoseLandmarkOptimizer -> solve recovers the world -> save updates
    both poses and landmarks."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        PoseLandmarkOptimizer,
    )

    P, M = 6, 12
    true_poses = [
        Pose.from_axis_angle(
            2 * np.pi * k / P, [0, 0, 1],
            [3 * np.cos(2 * np.pi * k / P), 3 * np.sin(2 * np.pi * k / P), 0.0],
        )
        for k in range(P)
    ]
    true_lms = rng.uniform(-1.5, 1.5, size=(M, 3))

    g = g2o_io.G2oGraph(dim=3)
    for k, p in enumerate(true_poses):
        t = p.translation + (rng.normal(0, 0.1, 3) if k else 0.0)
        g.vertices[k] = np.concatenate([t, p.quaternion()])
    for j in range(M):
        g.landmarks[100 + j] = true_lms[j] + rng.normal(0, 0.2, 3)
    info6 = np.eye(6) * 100.0
    for k in range(P - 1):
        rel = true_poses[k].inverse() * true_poses[k + 1]
        g.edges.append(
            g2o_io.G2oEdge(
                k, k + 1,
                np.concatenate([rel.translation, rel.quaternion()]), info6,
            )
        )
    info3 = np.diag([50.0, 60.0, 70.0])
    for k, p in enumerate(true_poses):
        for j in range(M):
            z = p.rotation.T @ (true_lms[j] - p.translation)
            g.landmark_edges.append(g2o_io.G2oEdge(k, 100 + j, z, info3))

    path = str(tmp_path / "lm.g2o")
    g2o_io.write_g2o(path, g)
    g2 = g2o_io.read_g2o(path)
    assert len(g2.landmarks) == M and len(g2.landmark_edges) == P * M
    np.testing.assert_allclose(g2.landmark_edges[0].information, info3, rtol=1e-6)

    opt = g2o_io.load_pose_graph(path)
    assert isinstance(opt, PoseLandmarkOptimizer)
    summary, _ = opt.solve(Options().replace(max_iterations=100))
    for j in range(M):
        np.testing.assert_allclose(opt.get_landmark(100 + j), true_lms[j], atol=1e-4)
    for k, p in enumerate(true_poses):
        np.testing.assert_allclose(
            opt.get_pose(k).translation, p.translation, atol=1e-4
        )

    out = str(tmp_path / "lm_solved.g2o")
    g2o_io.save_pose_graph(out, opt, graph=g2)
    g3 = g2o_io.read_g2o(out)
    np.testing.assert_allclose(
        g3.landmarks[100], opt.get_landmark(100), atol=1e-6
    )
    np.testing.assert_allclose(
        g3.vertices[2][:3], opt.get_pose(2).translation, atol=1e-6
    )


def test_landmark_edge_offset_param_form(tmp_path):
    """EDGE_SE3_TRACKXYZ with the PARAMS_SE3OFFSET id token (the g2o
    binary's native output form) parses identically."""
    text = (
        "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
        "VERTEX_TRACKXYZ 5 1 2 3\n"
        "EDGE_SE3_TRACKXYZ 0 5 0 1 2 3 10 0 0 10 0 10\n"  # with offset id
    )
    p = tmp_path / "off.g2o"
    p.write_text(text)
    g = g2o_io.read_g2o(str(p))
    e = g.landmark_edges[0]
    assert (e.i, e.j) == (0, 5)
    np.testing.assert_allclose(e.measurement, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.diag(e.information), [10, 10, 10])


def test_truncated_records_rejected(tmp_path):
    """Truncated lines must raise, not zero-fill the information matrix
    (a partially-downloaded file would otherwise solve with silently
    under-weighted edges)."""
    p = tmp_path / "trunc.g2o"
    base = "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\nVERTEX_SE3:QUAT 1 1 0 0 0 0 0 1\n"
    full = ("EDGE_SE3:QUAT 0 1 1 0 0 0 0 0 1 " + " ".join(["1"] * 21) + "\n")
    p.write_text(base + full)
    g2o_io.read_g2o(str(p))  # sanity: full record parses
    for cut in (full.rsplit(" ", 3)[0] + "\n",  # 18 of 21 info entries
                "VERTEX_SE2 0 0 0\n",
                "VERTEX_SE3:QUAT 2 1 0 0\n"):
        p.write_text(base + cut if cut.startswith("EDGE") else cut)
        with pytest.raises(ValueError, match="malformed"):
            g2o_io.read_g2o(str(p))


def test_nonidentity_sensor_offset_rejected(tmp_path):
    p = tmp_path / "off.g2o"
    p.write_text(
        "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
        "PARAMS_SE3OFFSET 0 0.5 0 0 0 0 0 1\n"  # 0.5 m sensor offset
    )
    with pytest.raises(ValueError, match="PARAMS_SE3OFFSET"):
        g2o_io.read_g2o(str(p))
    # identity offset is fine
    p.write_text(
        "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
        "PARAMS_SE3OFFSET 0 0 0 0 0 0 0 1\n"
    )
    g2o_io.read_g2o(str(p))


def test_save_landmark_optimizer_without_graph(tmp_path, rng):
    """save_pose_graph(path, opt) with NO source graph reconstructs
    vertices, landmarks, edges, and observations for both landmark
    optimizers (the documented no-graph form)."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        PoseLandmark2DOptimizer,
        PoseLandmarkOptimizer,
    )

    o3 = PoseLandmarkOptimizer()
    o3.set_pose(0, Pose.identity())
    o3.set_pose(1, Pose(np.eye(3), np.array([1.0, 0.0, 0.0])))
    o3.set_landmark(10, np.array([0.5, 0.5, 0.0]))
    o3.set_constraint(0, 1, Pose(np.eye(3), np.array([1.0, 0.0, 0.0])))
    o3.set_observation(0, 10, np.array([0.5, 0.5, 0.0]))
    p3 = str(tmp_path / "bare3.g2o")
    g2o_io.save_pose_graph(p3, o3)
    g3 = g2o_io.read_g2o(p3)
    assert g3.dim == 3 and len(g3.landmarks) == 1 and len(g3.landmark_edges) == 1

    o2 = PoseLandmark2DOptimizer()
    o2.set_pose(0, [0.0, 0.0, 0.0])
    o2.set_pose(1, [1.0, 0.0, 0.0])
    o2.set_landmark(10, [0.5, 0.5])
    o2.set_constraint(0, 1, [1.0, 0.0, 0.0])
    o2.set_observation(0, 10, [0.5, 0.5])
    p2 = str(tmp_path / "bare2.g2o")
    g2o_io.save_pose_graph(p2, o2)
    g2 = g2o_io.read_g2o(p2)
    assert g2.dim == 2 and len(g2.landmarks) == 1 and len(g2.landmark_edges) == 1


def test_unit_information_flag(tmp_path, rng):
    """unit_information=True ignores file info matrices — the loaded
    optimizer must carry no sqrt_info (the reference's unweighted
    behavior)."""
    g = g2o_io.G2oGraph(dim=3)
    for k in range(3):
        g.vertices[k] = np.array([k, 0, 0, 1.0, 0, 0, 0][0:3] + [1.0, 0, 0, 0])
        g.vertices[k][:3] = [k, 0.0, 0.0]
    info = random_spd(rng, 6)
    for k in range(2):
        g.edges.append(g2o_io.G2oEdge(
            k, k + 1, np.array([1.0, 0, 0, 1.0, 0, 0, 0]), info))
    path = str(tmp_path / "u.g2o")
    g2o_io.write_g2o(path, g)

    weighted = g2o_io.load_pose_graph(path)
    unweighted = g2o_io.load_pose_graph(path, unit_information=True)
    assert all(c["sqrt_info"] is None for c in unweighted.constraints())
    assert all(c["sqrt_info"] is not None for c in weighted.constraints())
