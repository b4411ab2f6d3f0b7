"""Nested-dissection multifrontal block-sparse Cholesky, the TPU way.

The reference's pose-graph analytic path is an unimplemented stub whose
comments name "Sparse Cholesky" as the intended linear solver
(pose_graph_optimizer_analytic.cc:12-51, options.h:11-13 LinearSolverType).
A classical supernodal sparse Cholesky (CHOLMOD-style pointer-chasing
over dynamically-sized supernodes) is the wrong shape for a TPU; the
TPU-native equivalent built here is the MULTIFRONTAL method with
STATICALLY PLANNED, LEVEL-BATCHED dense fronts:

  1. HOST symbolic phase (:func:`symbolic`), once per graph topology:
     recursive nested dissection (geometric median cut when vertex
     coordinates are available — SLAM graphs always have pose positions
     — else a reverse-Cuthill-McKee linearization cut) produces a
     separator tree. For every tree node we precompute its interior
     variables, its boundary (the ancestor variables its subtree couples
     to after fill-in, by the standard bottom-up recurrence
     bnd(n) = (U bnd(children) U N(vars(n))) \\ subtree(n)), and flat
     int32 scatter maps: edge block -> (front, row, col) slot,
     variable -> (front, slot), child boundary slot -> parent slot.

  2. DEVICE numeric phase (:func:`factor` / :func:`solve_factored`),
     per LM iteration: fronts at the same tree depth are PADDED TO A
     COMMON SIZE and processed as ONE batched tensor per depth —
     batched Cholesky of the interior block, batched triangular solve
     for the coupling panel, one `highest`-precision matmul for the
     Schur complement, and a single scatter-add "extend-add" into the
     parent depth. ceil(log2(P/leaf)) such batched steps replace the
     P sequential pivots of a scalar sparse factorization: all FLOPs
     are dense panels (MXU work), all shapes are static, and the whole
     factorization lives inside one jit.

Complexity matches nested dissection: O(P^{3/2}) flops on planar-ish
SLAM graphs vs O(P * b^2) for the RCM-banded solver — on loop-rich
"fat bandwidth" graphs (Olson's Manhattan worlds, where RCM bandwidth
grows with the arena diameter) this is the solver class the banded
superblock path cannot reach.

Used by solvers/pose_graph.py (solver='sparse', 3D and SE(2)); generic
over the per-vertex block dimension d.
"""

from typing import List, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

Array = jax.Array


class _DepthPlan(NamedTuple):
    """Per-depth static scatter maps (all numpy on the host; converted
    to device constants at trace time)."""

    num_fronts: int
    ni: int  # padded interior block count
    nb: int  # padded boundary block count
    row_off: int  # offset of this depth in the flat ROW buffer
    # assembly at this depth, as BLOCK-coordinate scatters into the
    # depth's SCALAR-layout (nF, m, m) front tensor. (A single flat
    # (tot_blk, d, d) buffer was 57x larger on TPU than its element
    # count: arrays are physically tiled on their LAST TWO dims, so a
    # (d, d) minor block pads to (4, 128) per block — 39 GB for a
    # 10k-pose city. Keeping the minor dims front-sized avoids it.)
    asm_src: np.ndarray  # (na,) rows into concat[B_uu,B_vv,B_uv,B_vu,diag]
    asm_f: np.ndarray  # (na,) front index
    asm_r: np.ndarray  # (na,) row BLOCK slot
    asm_c: np.ndarray  # (na,) col BLOCK slot
    # variable assembly (solution slots)
    va_pid: np.ndarray  # (nv,) vertex ids
    va_f: np.ndarray  # (nv,)
    va_slot: np.ndarray  # (nv,) interior slot
    pad_diag: np.ndarray  # (num_fronts, (ni+nb)*d) 1.0 at padded interior
    # extend-add of the CHILD depth (depth+1) into this depth, as
    # BATCHED ONE-HOT MATMULS T_c = P_c^T S_c P_c + full-panel gathers
    # by parent (binary dissection: <= 2 children per front). TPU
    # scatters serialize (~0.85 us per scattered block, measured) and
    # 36-byte block gathers are memory-latency bound (~150 ms per
    # factor on manhattan3500); the selection products are MXU work
    # (~1 ms for the same extend-add). Dummy child index = nF_child
    # (gathers an explicit zero panel); pad slots map to a dummy
    # column sliced off the one-hot.
    child_of: np.ndarray  # (num_fronts, 2) index into child T array
    ch_map: np.ndarray  # (nC, nb_child) parent BLOCK slot; pads -> ni+nb
    # boundary gather for back-substitution (pads -> 0; harmless, the
    # corresponding W columns are exactly zero)
    bnd_pid: np.ndarray  # (num_fronts, nb)
    # GATHER-form assembly (round 5): the dual of the asm_* scatter.
    # TPU scatter-adds serialize (~0.85 us per scattered block), and the
    # per-iteration front assembly was the last scatter left in the
    # numeric phase (~20-30 ms/iter at manhattan scale). Structure used:
    # every contribution lands in the INTERIOR row strip (rows < ni;
    # includes the full symmetric interior square since both (u,v) and
    # (v,u) entries exist) or on the BOUNDARY DIAGONAL (the B_vv block
    # of an upward edge); the (bnd, int) mirror is never read by the
    # factorization (it consumes A11/A12/A22 only) and the off-diagonal
    # (bnd, bnd) region receives extend-add panels only. Duplicate
    # contributions per destination pre-sum over KMAX rounds of padded
    # gathers (kmax ~ 1 + max vertex degree at the depth), then one
    # PLANE-layout gather per region materializes it — a naive
    # (nF, nblk, nblk, d, d) whole-front gather would tile each (d, d)
    # minor to (8, 128): measured 26 GB for manhattan10000's 13M
    # padded slots, vs ~40 MB for the strip.
    gat_src: Optional[np.ndarray] = None  # (kmax, ndest) rows into
    # concat[B_uu,B_vv,B_uv,B_vu,diag,zero-pad]; pad row = 4E+P
    dest_map: Optional[np.ndarray] = None  # (nF, ni, nblk) -> dest id,
    # ndest for never-written (zero) slots
    gat22_src: Optional[np.ndarray] = None  # (k22, ndest22) boundary-
    # diagonal contributions
    dest22_map: Optional[np.ndarray] = None  # (nF, nb) -> dest22 id or
    # ndest22


import dataclasses


@dataclasses.dataclass(eq=False)  # identity hash/eq: plans are cached
class Plan:                       # per topology and passed to jit as a
    """Symbolic factorization: static shapes + scatter maps per depth.
    (STATIC argument — numpy payloads cannot be value-hashed.)

    ``depths[0]`` is the ROOT; the numeric phase processes
    ``depths[-1] .. depths[0]`` (leaves up) then back down."""

    P: int
    d: int
    E: int
    swap: np.ndarray  # (E,) True where endpoint b is eliminated first
    depths: List[_DepthPlan]
    tot_row: int  # total d-rows across all depths
    rhs_idx: np.ndarray  # (P,) flat row index of each vertex (unique)

    @property
    def num_levels(self) -> int:
        return len(self.depths)

    def stats(self) -> dict:
        """Shape diagnostics for solver selection / logging."""
        fronts = [(dp.num_fronts, dp.ni, dp.nb) for dp in self.depths]
        flops = sum(
            nf * ((ni * self.d) ** 3 / 3.0 + (ni * self.d) ** 2 * (nb * self.d))
            for nf, ni, nb in fronts
        )
        mem = sum(
            nf * ((ni + nb) * self.d) ** 2 for nf, ni, nb in fronts
        )
        return dict(
            levels=len(fronts),
            fronts=fronts,
            factor_flops=flops,
            front_elems=mem,
            max_front=max((ni + nb) * self.d for _, ni, nb in fronts),
        )


class _Node:
    __slots__ = ("vars", "children", "depth", "bnd", "parent", "_subtree")

    def __init__(self, vars_, children):
        self.vars = vars_  # np.int64 array
        self.children = children  # list of _Node
        self.depth = 0
        self.bnd = None
        self.parent = None


def _rcm_order(V, sa, sb):
    """Reverse Cuthill-McKee linearization of the subgraph (V, sa-sb):
    its median cut is a narrow frontier on chain-like topology."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = len(V)
    local = np.full(int(V.max()) + 1 if n else 1, -1, np.int64)
    local[V] = np.arange(n)
    A = coo_matrix(
        (np.ones(len(sa)), (local[sa], local[sb])), shape=(n, n)
    ).tocsr()
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))


def _candidate_orders(V, sa, sb, coords):
    """Cut oracles to try: geometric (widest coordinate axis — best for
    arena-style graphs) and RCM (best for chains: a random-walk PATH
    crosses any coordinate plane many times, so a geometric cut of a
    chain yields a huge separator; measured 29M padded front blocks ->
    OOM on a 50k-pose chain+rings graph before this dual-oracle pick)."""
    orders = []
    if coords is not None:
        c = coords[V]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        orders.append(np.argsort(c[:, axis], kind="stable"))
    orders.append(_rcm_order(V, sa, sb))
    return orders


def _bisect(V, sa, sb, coords, leaf_size, scratch):
    """Recursive nested dissection. (sa, sb) are the edges with BOTH
    endpoints in V; ``scratch`` is a reusable (P,) work array."""
    if len(V) <= leaf_size:
        return _Node(V, [])
    best = None
    for order in _candidate_orders(V, sa, sb, coords):
        half = len(V) // 2
        A, B = V[order[:half]], V[order[half:]]
        # side[v]: 0 for A, 1 for B
        scratch[A] = 0
        scratch[B] = 1
        side_a, side_b = scratch[sa], scratch[sb]
        # separator: A-side endpoints of every A-B edge (then A\S and B
        # are edge-disjoint, so S separates them)
        cut = side_a != side_b
        sep_vs = np.unique(
            np.concatenate([sa[cut & (side_a == 0)], sb[cut & (side_b == 0)]])
        )
        if best is None or len(sep_vs) < len(best[0]):
            best = (sep_vs, A, B)
    sep_vs, A, B = best
    scratch[A] = 0
    scratch[sep_vs] = 2
    S = sep_vs
    A2 = A[scratch[A] != 2]
    children = []
    for part in (A2, B):
        if not len(part):
            continue
        scratch[V] = 0
        scratch[part] = 1
        keep = (scratch[sa] == 1) & (scratch[sb] == 1)
        children.append(
            _bisect(part, sa[keep], sb[keep], coords, leaf_size,
                    scratch)
        )
    if not children:  # cannot happen (len(V) > leaf_size >= 1) but be safe
        return _Node(V, [])
    return _Node(S, children)


def symbolic(
    num_vertices: int,
    e_a: np.ndarray,
    e_b: np.ndarray,
    d: int,
    coords: Optional[np.ndarray] = None,
    leaf_size: int = 32,
    max_front_bytes: int = 4 << 30,
) -> Plan:
    """Build the separator tree and every static scatter map.

    Args:
      num_vertices: P vertices, each a d-dimensional parameter block.
      e_a, e_b: (E,) endpoint vertex ids of the coupling edges.
      coords: optional (P, >=2) vertex coordinates for geometric cuts
        (pose positions — the natural nested-dissection oracle for SLAM).
      leaf_size: stop recursion at subgraphs this small; the leaf front
        becomes one dense panel.
    """
    P, E = int(num_vertices), len(e_a)
    e_a = np.asarray(e_a, np.int64)
    e_b = np.asarray(e_b, np.int64)
    # CSR adjacency (both directions)
    src = np.concatenate([e_a, e_b])
    dst = np.concatenate([e_b, e_a])
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    indptr = np.zeros(P + 1, np.int64)
    np.add.at(indptr, src_s + 1, 1)
    indptr = np.cumsum(indptr)
    indices = dst_s

    scratch = np.zeros(P, np.int8)
    root = _bisect(
        np.arange(P, dtype=np.int64), e_a, e_b,
        None if coords is None else np.asarray(coords, np.float64),
        leaf_size, scratch,
    )

    # depth assignment + bottom-up boundary sets
    nodes: List[_Node] = []
    stack = [(root, 0, None)]
    while stack:
        n, dep, par = stack.pop()
        n.depth, n.parent = dep, par
        nodes.append(n)
        for c in n.children:
            stack.append((c, dep + 1, n))
    max_depth = max(n.depth for n in nodes)

    node_of = np.full(P, -1, np.int64)
    for idx, n in enumerate(nodes):
        node_of[n.vars] = idx

    # bottom-up: subtree sets + boundary sets (sorted np arrays)
    for n in sorted(nodes, key=lambda n: -n.depth):
        sub = n.vars
        bnd = np.zeros(0, np.int64)
        for c in n.children:
            sub = np.union1d(sub, c._subtree)  # type: ignore[attr-defined]
            bnd = np.union1d(bnd, c.bnd)
        if len(n.vars):
            nb_list = [
                indices[indptr[v]:indptr[v + 1]] for v in n.vars
            ]
            if nb_list:
                bnd = np.union1d(bnd, np.unique(np.concatenate(nb_list)))
        n.bnd = np.setdiff1d(bnd, sub)
        n._subtree = sub  # type: ignore[attr-defined]
    if len(root.bnd):
        raise AssertionError("root boundary must be empty")

    # slot maps (vertex -> (node, slot)); bnd slots offset by PADDED ni
    by_depth: List[List[_Node]] = [[] for _ in range(max_depth + 1)]
    for n in nodes:
        by_depth[n.depth].append(n)
    ni_pad = [max(1, max(len(n.vars) for n in lvl)) for lvl in by_depth]
    nb_pad = [max(len(n.bnd) for n in lvl) for lvl in by_depth]

    slot_of = {}  # vertex/bnd-of-node lookup: (node_id) -> {vertex: slot}
    front_idx = {}
    for dep, lvl in enumerate(by_depth):
        for f, n in enumerate(lvl):
            front_idx[id(n)] = f
            m = {int(v): i for i, v in enumerate(n.vars)}
            for j, v in enumerate(n.bnd):
                m[int(v)] = ni_pad[dep] + j
            slot_of[id(n)] = m

    node_list = nodes  # by id
    node_depth = np.array([n.depth for n in nodes])

    # edge orientation: u = endpoint at the DEEPER node (eliminated first)
    na = node_of[e_a]
    nb_ = node_of[e_b]
    da, db = node_depth[na], node_depth[nb_]
    bad = (da == db) & (na != nb_)
    if bad.any():
        raise AssertionError(
            "edge between unrelated tree nodes — separator property violated"
        )
    swap = db > da  # b eliminated first
    u = np.where(swap, e_b, e_a)
    v = np.where(swap, e_a, e_b)
    host_node = np.where(swap, nb_, na)

    # row-buffer offsets + memory guard (fronts are SCALAR-layout
    # (nF, m, m) per depth — see _DepthPlan)
    row_offs = []
    tot_blk = tot_row = 0
    for dep, lvl in enumerate(by_depth):
        nblk = ni_pad[dep] + nb_pad[dep]
        row_offs.append(tot_row)
        tot_blk += len(lvl) * nblk * nblk
        tot_row += len(lvl) * nblk
    if tot_blk * d * d * 4 > max_front_bytes:
        raise ValueError(
            f"multifrontal: padded fronts need "
            f"~{tot_blk * d * d * 4 / 1e9:.1f} GB of f32 — the separator "
            "sizes this dissection found are not sparse-friendly (an "
            "expander-like graph, or pathological level-size variance); "
            "use solver='cg' (matrix-free) instead"
        )

    # per-edge assembly entries (4 blocks: uu, vv, uv, vu), grouped by
    # hosting depth; source row indexes concat[B_uu,B_vv,B_uv,B_vu,diag]
    asm_by_depth = [[] for _ in by_depth]  # (src, f, r, c)
    for e in range(E):
        n = node_list[host_node[e]]
        dep = n.depth
        sm = slot_of[id(n)]
        f = front_idx[id(n)]
        ru, rv = sm[int(u[e])], sm[int(v[e])]
        if ru >= ni_pad[dep]:
            raise AssertionError("u endpoint not interior at its own node")
        a = asm_by_depth[dep]
        a.append((e, f, ru, ru))
        a.append((E + e, f, rv, rv))
        a.append((2 * E + e, f, ru, rv))
        a.append((3 * E + e, f, rv, ru))

    depths: List[_DepthPlan] = []
    rhs_idx = np.empty(P, np.int64)
    for dep, lvl in enumerate(by_depth):
        ni, nbp = ni_pad[dep], nb_pad[dep]
        nblk = ni + nbp
        nF = len(lvl)
        va_pid, va_f, va_slot = [], [], []
        pad_diag = np.zeros((nF, nblk * d), np.float64)
        bnd_pid = np.zeros((nF, nbp), np.int64)
        asm = asm_by_depth[dep]
        for f, n in enumerate(lvl):
            for i, vtx in enumerate(n.vars):
                va_pid.append(int(vtx))
                va_f.append(f)
                va_slot.append(i)
                asm.append((4 * E + int(vtx), f, i, i))
                rhs_idx[vtx] = row_offs[dep] + f * nblk + i
            pad_diag[f, len(n.vars) * d: ni * d] = 1.0
            bnd_pid[f, : len(n.bnd)] = n.bnd
        asm_arr = np.asarray(asm, np.int64).reshape(-1, 4)
        # gather-form assembly maps (see _DepthPlan.gat_src) — built
        # ONLY when the ablation mode is active at symbolic time: the
        # default scatter lowering never reads them, and dest_map alone
        # is the size of the whole interior strip (~tens of MB per
        # cached city-scale plan) plus a per-depth argsort of host time
        nblk_dep = ni + nbp
        pad_src = 4 * E + P  # zero pad row appended to blocks_cat

        def _gather_rounds(entries, keys, nslots):
            """(kmax, ndest) pre-sum rounds + (nslots,) flat dest map
            from (src, key) contribution lists."""
            if len(entries) == 0:
                dmap = np.full(nslots, 0, np.int32)
                return np.zeros((0, 0), np.int32), dmap
            aorder = np.argsort(keys, kind="stable")
            sk = keys[aorder]
            src_sorted = entries[aorder]
            dstarts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
            uniq = sk[dstarts]
            counts = np.diff(np.r_[dstarts, len(sk)])
            ndest = len(uniq)
            kmax = int(counts.max())
            gsrc = np.full((kmax, ndest), pad_src, np.int32)
            for t in range(kmax):
                sel = counts > t
                gsrc[t, sel] = src_sorted[dstarts[sel] + t]
            dmap = np.full(nslots, ndest, np.int32)
            dmap[uniq] = np.arange(ndest, dtype=np.int32)
            return gsrc, dmap

        if _ASSEMBLY_MODE == "gather":
            in_strip = asm_arr[:, 2] < ni
            on_bdiag = ~in_strip & (asm_arr[:, 2] == asm_arr[:, 3])
            dropped = ~in_strip & ~on_bdiag & (asm_arr[:, 3] >= ni)
            if dropped.any():
                raise AssertionError(
                    "assembly entry in the off-diagonal boundary region"
                )
            st = asm_arr[in_strip]
            strip_keys = (st[:, 1] * ni + st[:, 2]) * nblk_dep + st[:, 3]
            gat_src, dest_map = _gather_rounds(
                st[:, 0], strip_keys, nF * ni * nblk_dep
            )
            dest_map = dest_map.reshape(nF, ni, nblk_dep)
            bd = asm_arr[on_bdiag]
            bd_keys = bd[:, 1] * nbp + (bd[:, 2] - ni) if nbp else bd[:, 1]
            gat22_src, dest22_map = _gather_rounds(
                bd[:, 0], bd_keys, nF * nbp
            )
            dest22_map = dest22_map.reshape(nF, nbp)
        else:
            gat_src = dest_map = gat22_src = dest22_map = None
        # gather-form extend-add: inverse maps child bnd slot <- parent
        # slot, per parent front and child position (binary tree: <= 2)
        if dep + 1 <= max_depth:
            child_lvl = by_depth[dep + 1]
            nbc = nb_pad[dep + 1]
            nCc = len(child_lvl)
            child_of = np.full((nF, 2), nCc, np.int32)  # dummy = zero panel
            ch_map = np.full((nCc, nbc), nblk, np.int32)  # pad -> dummy col
            child_count = np.zeros(nF, np.int64)
            for c_idx, c in enumerate(child_lvl):
                p = c.parent
                if p.depth != dep:
                    raise AssertionError("tree parent depth mismatch")
                fp = front_idx[id(p)]
                k = child_count[fp]
                if k >= 2:
                    raise AssertionError("non-binary separator tree")
                child_count[fp] = k + 1
                child_of[fp, k] = c_idx
                psm = slot_of[id(p)]
                for j, w in enumerate(c.bnd):
                    ch_map[c_idx, j] = psm[int(w)]
        else:
            child_of = np.zeros((nF, 2), np.int32)
            ch_map = np.zeros((0, 0), np.int32)
        depths.append(
            _DepthPlan(
                num_fronts=nF,
                ni=ni,
                nb=nbp,
                row_off=row_offs[dep],
                asm_src=asm_arr[:, 0].astype(np.int32),
                asm_f=asm_arr[:, 1].astype(np.int32),
                asm_r=asm_arr[:, 2].astype(np.int32),
                asm_c=asm_arr[:, 3].astype(np.int32),
                va_pid=np.asarray(va_pid, np.int64),
                va_f=np.asarray(va_f, np.int32),
                va_slot=np.asarray(va_slot, np.int32),
                pad_diag=pad_diag,
                child_of=child_of,
                ch_map=ch_map,
                bnd_pid=bnd_pid,
                gat_src=gat_src,
                dest_map=dest_map,
                gat22_src=gat22_src,
                dest22_map=dest22_map,
            )
        )
    return Plan(
        P=P, d=d, E=E, swap=swap, depths=depths,
        tot_row=tot_row, rhs_idx=rhs_idx,
    )


# ---------------------------------------------------------------------------
# numeric phase (device, jit-traceable; plan arrays become constants)
# ---------------------------------------------------------------------------


def _hp():
    return jax.default_matmul_precision("highest")


# Front-assembly lowering: "scatter" (block-coordinate scatter-add,
# the DEFAULT) or "gather" (kmax pre-sum rounds + plane-layout strip
# gather + boundary-diag broadcast, no scatter anywhere). Round-5
# verdict on real hardware, manhattan3500 f32 end-to-end: scatter
# ~28 ms/LM-iteration total vs gather ~49 — the gather's strip
# (d, d, nF, ni, nblk) -> (nF, mi, m) transpose relayout costs more
# than the scatter it removes (and the naive whole-front gather
# variant tiles (d, d) minors to (8, 128): 26 GB at manhattan10000).
# The scatter is NOT this solver's bottleneck; both modes are kept,
# measured, and exactness-tested (tests/test_pose_graph_sparse.py).
_ASSEMBLY_MODE = "scatter"


def _front_sharding(mesh):
    """Identity when mesh is None; else a with_sharding_constraint over
    the leading (front) axis on the mesh's "factors" axis."""
    if mesh is None:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec

    n_dev = int(np.prod(list(mesh.shape.values())))

    def constrain(x):
        if x.shape[0] % n_dev == 0:
            # enough fronts: partition the batch (front) axis
            spec = PartitionSpec("factors", *([None] * (x.ndim - 1)))
        elif x.ndim >= 2 and x.shape[-1] % n_dev == 0:
            # top levels (few big panels): partition the panel columns
            spec = PartitionSpec(
                *([None] * (x.ndim - 1)), "factors"
            )
        else:
            spec = PartitionSpec()
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec)
        )

    return constrain


def factor(plan: Plan, B_aa: Array, B_bb: Array, B_ab: Array, diag: Array,
           mesh=None):
    """Assemble + factor the block-sparse SPD system.

    A[a,a] += B_aa[e], A[b,b] += B_bb[e], A[a,b] += B_ab[e] (and its
    transpose) for each edge e = (a, b), plus ``diag`` (P, d) on the
    diagonal. Returns an opaque factor for :func:`solve_factored`.

    ``mesh``: optional jax.sharding.Mesh with a "factors" axis. Fronts
    at each tree depth are independent batched panels, so the
    scaling-book recipe applies directly: annotate the per-level front
    tensors with a NamedSharding over the FRONT axis and let XLA's SPMD
    partitioner place the batched Cholesky/triangular-solve/Schur
    panels per device and insert the extend-add collectives (the
    child->parent panel gathers become all-to-alls). Top levels with
    fewer fronts than devices partition the panel matmul dims instead.
    Sharded == unsharded is asserted in tests on the 8-device CPU mesh.
    """
    constrain = _front_sharding(mesh)
    d = plan.d
    dtype = B_aa.dtype
    swap = jnp.asarray(plan.swap)[:, None, None]
    B_uu = jnp.where(swap, B_bb, B_aa)
    B_vv = jnp.where(swap, B_aa, B_bb)
    B_ab_T = jnp.swapaxes(B_ab, -1, -2)
    B_uv = jnp.where(swap, B_ab_T, B_ab)
    # diag: (P, d) diagonal entries, or (P, d, d) full per-vertex blocks
    # (the Schur-reduced landmark-SLAM pose system has dense same-pose
    # blocks)
    if diag.ndim == 3:
        diag_blocks = diag
    else:
        diag_blocks = diag[:, :, None] * jnp.eye(d, dtype=dtype)

    blocks_pad = jnp.concatenate(
        [B_uu, B_vv, B_uv, jnp.swapaxes(B_uv, -1, -2), diag_blocks,
         jnp.zeros((1, d, d), dtype)], axis=0
    )

    levels = []
    S_prev = None  # child Schur complements, dense (nC, mb_c, mb_c)
    for dep in range(plan.num_levels - 1, -1, -1):
        dp = plan.depths[dep]
        nblk = dp.ni + dp.nb
        m = nblk * d
        mi = dp.ni * d
        # Assembly (round 5): block-coordinate SCATTER by default —
        # measured faster end-to-end on hardware than the scatter-free
        # gather lowering (see the _ASSEMBLY_MODE note). The gather
        # ablation keeps these facts: contributions only ever land in
        # the interior row STRIP
        # (rows < mi, symmetric interior square included) and on the
        # boundary DIAGONAL; the factorization reads A11/A12/A22 only,
        # so those two regions are assembled separately (strip as a
        # plane-layout gather — a naive 5-D block gather materialized
        # (d, d)-minor buffers that TPU tiling pads 57x, 26 GB at
        # manhattan10000 — boundary diag as a fused broadcast-mask) and
        # the never-read (bnd, int) mirror is never built.
        use_gather = _ASSEMBLY_MODE == "gather"
        if use_gather and dp.gat_src is None:
            raise ValueError(
                "multifrontal: _ASSEMBLY_MODE='gather' but this plan was "
                "built without gather maps — set the mode BEFORE symbolic()"
            )
        mb = dp.nb * d
        if use_gather:
            if dp.gat_src.size:
                acc = blocks_pad[jnp.asarray(dp.gat_src[0])]
                for t in range(1, dp.gat_src.shape[0]):
                    acc = acc + blocks_pad[jnp.asarray(dp.gat_src[t])]
                acc = jnp.concatenate(
                    [acc, jnp.zeros((1, d, d), dtype)], axis=0
                )
                acc_planes = jnp.transpose(acc, (1, 2, 0))
                tmp = acc_planes[:, :, jnp.asarray(dp.dest_map)]
                # tmp: (d, d, nF, ni, nblk) -> (f, bi, di, bj, dj)
                strip = jnp.transpose(tmp, (2, 3, 0, 4, 1)).reshape(
                    dp.num_fronts, mi, m
                )
            else:
                strip = jnp.zeros((dp.num_fronts, mi, m), dtype)
            A11 = strip[:, :, :mi]
            A12 = strip[:, :, mi:]
            if dp.nb and dp.gat22_src is not None and dp.gat22_src.size:
                a22 = blocks_pad[jnp.asarray(dp.gat22_src[0])]
                for t in range(1, dp.gat22_src.shape[0]):
                    a22 = a22 + blocks_pad[jnp.asarray(dp.gat22_src[t])]
                a22 = jnp.concatenate(
                    [a22, jnp.zeros((1, d, d), dtype)], axis=0
                )
                D22 = a22[jnp.asarray(dp.dest22_map)]  # (nF, nb, d, d)
                eye_nb = jnp.eye(dp.nb, dtype=dtype)
                A22 = (
                    D22[:, :, :, None, :]
                    * eye_nb[None, :, None, :, None]
                ).reshape(dp.num_fronts, mb, mb)
            else:
                A22 = jnp.zeros((dp.num_fronts, mb, mb), dtype)
        else:
            F = jnp.zeros((dp.num_fronts, m, m), dtype)
            if len(dp.asm_src):
                rng_d = jnp.arange(d, dtype=jnp.int32)
                rows = jnp.asarray(dp.asm_r)[:, None] * d + rng_d
                cols = jnp.asarray(dp.asm_c)[:, None] * d + rng_d
                F = F.at[
                    jnp.asarray(dp.asm_f)[:, None, None],
                    rows[:, :, None], cols[:, None, :],
                ].add(blocks_pad[jnp.asarray(dp.asm_src)])
            A11 = F[:, :mi, :mi]
            A12 = F[:, :mi, mi:]
            A22 = F[:, mi:, mi:]
        if S_prev is not None:
            # extend-add as batched one-hot products T_c = P_c^T S_c P_c
            # (MXU work) + full-panel gathers by parent; see _DepthPlan.
            Psel = _selection(dp, d, m, dtype)  # (nC, mb_c, m)
            with _hp():
                T = jnp.swapaxes(Psel, -1, -2) @ (S_prev @ Psel)
            T_pad = jnp.concatenate(
                [T, jnp.zeros((1, m, m), dtype)], axis=0
            )
            T2 = (
                T_pad[jnp.asarray(dp.child_of[:, 0])]
                + T_pad[jnp.asarray(dp.child_of[:, 1])]
            )
            A11 = A11 + T2[:, :mi, :mi]
            A12 = A12 + T2[:, :mi, mi:]
            A22 = A22 + T2[:, mi:, mi:]
        pad_dg = jnp.asarray(dp.pad_diag, dtype)
        A11 = A11 + jnp.eye(mi, dtype=dtype) * pad_dg[:, None, :mi]
        if dp.nb:
            A22 = A22 + jnp.eye(mb, dtype=dtype) * pad_dg[:, None, mi:]

        L11 = constrain(jnp.linalg.cholesky(constrain(A11)))
        if dp.nb:
            W = constrain(solve_triangular(L11, A12, lower=True))
            with _hp():
                S_prev = constrain(
                    A22 - jnp.swapaxes(W, -1, -2) @ W
                )
        else:
            W = jnp.zeros((dp.num_fronts, mi, 0), dtype)
            S_prev = None
        levels.append((L11, W))
    levels.reverse()  # levels[dep] aligns with plan.depths[dep]
    return tuple(levels)


def _selection(dp: _DepthPlan, d: int, m: int, dtype) -> Array:
    """One-hot child-boundary -> parent-front selection matrices
    (nC, nb_child * d, m), built on device from the tiny int32 ch_map
    (a few KB of constants instead of tens of MB of dense one-hots
    shipped through the ~30 MB/s relay). Pad slots map to a dummy
    column that the slice drops, i.e. they select nothing."""
    ch_map = jnp.asarray(dp.ch_map)  # (nC, nbc), pad -> nblk
    cols = ch_map[:, :, None] * d + jnp.arange(d, dtype=ch_map.dtype)
    nC, nbc = dp.ch_map.shape
    cols = cols.reshape(nC, nbc * d)
    return jax.nn.one_hot(cols, m + d, dtype=dtype)[..., :m]


def solve_factored(plan: Plan, fact, b: Array) -> Array:
    """Solve A x = b against a :func:`factor` result. b, x: (P, d)."""
    d = plan.d
    dtype = b.dtype
    # one unique scatter seeds every front's interior rows
    rows = jnp.zeros((plan.tot_row, d), dtype).at[
        jnp.asarray(plan.rhs_idx)
    ].set(b, unique_indices=True)
    # forward pass: eliminate interiors leaves-up
    zs = [None] * plan.num_levels
    u_prev = None  # child rhs updates, dense (nC, mb_c)
    for dep in range(plan.num_levels - 1, -1, -1):
        dp = plan.depths[dep]
        L11, W = fact[dep]
        nblk = dp.ni + dp.nb
        m = nblk * d
        rf = rows[dp.row_off: dp.row_off + dp.num_fronts * nblk]
        rflat = rf.reshape(dp.num_fronts, m)
        if u_prev is not None:
            Psel = _selection(dp, d, m, dtype)
            with _hp():
                uT = jnp.einsum("cjm,cj->cm", Psel, u_prev)
            uT_pad = jnp.concatenate(
                [uT, jnp.zeros((1, m), dtype)], axis=0
            )
            rflat = rflat + uT_pad[jnp.asarray(dp.child_of[:, 0])]
            rflat = rflat + uT_pad[jnp.asarray(dp.child_of[:, 1])]
        mi = dp.ni * d
        b1 = rflat[:, :mi]
        z = solve_triangular(L11, b1[..., None], lower=True)[..., 0]
        zs[dep] = z
        if dp.nb:
            with _hp():
                u_prev = rflat[:, mi:] - jnp.einsum("fib,fi->fb", W, z)
        else:
            u_prev = None
    # backward pass: root-down back-substitution
    x = jnp.zeros((plan.P, d), dtype)
    for dep in range(plan.num_levels):
        dp = plan.depths[dep]
        L11, W = fact[dep]
        z = zs[dep]
        if dp.nb:
            xb = x[jnp.asarray(dp.bnd_pid)].reshape(dp.num_fronts, -1)
            with _hp():
                t = z - jnp.einsum("fib,fb->fi", W, xb)
        else:
            t = z
        x1 = solve_triangular(L11, t[..., None], lower=True, trans=1)[..., 0]
        if len(dp.va_pid):
            x1b = x1.reshape(dp.num_fronts, dp.ni, d)
            x = x.at[jnp.asarray(dp.va_pid)].set(
                x1b[jnp.asarray(dp.va_f), jnp.asarray(dp.va_slot)]
            )
    return x


def accumulate_rounds(P: int, e_a, e_b) -> np.ndarray:
    """(kmax, P) gather maps for SCATTER-FREE per-pose accumulation of
    per-edge contributions (round 5): ``sum over edges at pose p`` as
    kmax rounds of row gathers from ``concat[contrib_a, contrib_b,
    zero-pad]`` (pad id = 2E; kmax = max pose degree). TPU scatter-adds
    serialize at ~0.85 us per row; the gather rounds are fully
    parallel row loads. (Measured effect on the sparse pose-graph
    solver at manhattan10000: end-to-end unchanged within noise — the
    per-iteration cost there is not scatter-bound — but the rounds are
    never the serializing op and scale to higher-degree graphs.)

    Host symbolic, cached with the plan; use as::

        src = jnp.concatenate([c_a, c_b, zeros((1, ...))])
        out = sum(src[rounds[t]] for t in range(rounds.shape[0]))
    """
    e_a = np.asarray(e_a, np.int64)
    e_b = np.asarray(e_b, np.int64)
    E = len(e_a)
    dest = np.concatenate([e_a, e_b])
    order = np.argsort(dest, kind="stable").astype(np.int64)
    sd = dest[order]
    uniq, starts = np.unique(sd, return_index=True)
    counts = np.diff(np.r_[starts, len(sd)])
    kmax = int(counts.max()) if len(counts) else 1
    rounds = np.full((max(kmax, 1), P), 2 * E, np.int32)
    for t in range(kmax):
        sel = counts > t
        rounds[t, uniq[sel]] = order[starts[sel] + t]
    return rounds


def edge_matvec(
    e_a, e_b, B_aa: Array, B_bb: Array, B_ab: Array, diag: Array, x: Array
) -> Array:
    """y = A x with A given in edge-block form (for iterative
    refinement — one cheap segment-sum product instead of a second
    factorization)."""
    xa, xb = x[e_a], x[e_b]
    with _hp():
        ya = jnp.einsum("eij,ej->ei", B_aa, xa) + jnp.einsum(
            "eij,ej->ei", B_ab, xb
        )
        yb = jnp.einsum("eji,ej->ei", B_ab, xa) + jnp.einsum(
            "eij,ej->ei", B_bb, xb
        )
        base = (
            jnp.einsum("pij,pj->pi", diag, x) if diag.ndim == 3
            else diag * x
        )
    return base.at[e_a].add(ya).at[e_b].add(yb)


def solve(
    plan: Plan,
    e_a,
    e_b,
    B_aa: Array,
    B_bb: Array,
    B_ab: Array,
    diag: Array,
    b: Array,
    mesh=None,
) -> Array:
    """Factor + solve, with the repo's mixed-precision recipe: f64
    inputs are factored in f32 (the TPU's native precision — f64 panel
    products are ~10x emulated) and recovered to f64 step accuracy by
    two Wilkinson iterative-refinement sweeps whose residual matvec is
    one cheap edge-block product. At f32, steps are used unrefined: LM
    is an inexact-Newton loop and self-corrects mild step error, and a
    measured f32-refinement ablation on sphere2500 changed neither the
    final cost (2.78902e2 both ways) nor the plateau — only the
    per-iteration price."""
    if b.dtype == jnp.float64:
        f32 = jnp.float32
        fact = factor(
            plan, B_aa.astype(f32), B_bb.astype(f32), B_ab.astype(f32),
            diag.astype(f32), mesh=mesh,
        )
        x = solve_factored(plan, fact, b.astype(f32)).astype(b.dtype)
        for _ in range(2):
            resid = b - edge_matvec(e_a, e_b, B_aa, B_bb, B_ab, diag, x)
            x = x + solve_factored(plan, fact, resid.astype(f32)).astype(b.dtype)
        return x
    fact = factor(plan, B_aa, B_bb, B_ab, diag, mesh=mesh)
    return solve_factored(plan, fact, b)


def selected_inverse_pairs(plan: Plan, fact, pair_a, pair_b):
    """Diagonal blocks (P, d, d) of A^{-1} PLUS the off-diagonal blocks
    Sigma[a, b] (npairs, d, d) for requested vertex pairs.

    The pairs MUST be edges of the graph given to :func:`symbolic` (the
    filled pattern of the factorization then provably contains them:
    when the first-eliminated endpoint is interior in its front, the
    other endpoint is either interior in the same front or among its
    boundary vars, and the Takahashi recurrence materializes the full
    front covariance). This is the engine for landmark-SLAM marginal
    back-propagation: landmark covariances need Sigma_p over every
    co-visibility pose pair, which are exactly the fill edges of the
    reduced pose system (solvers/pose_landmark.py).

    One top-down sweep shared with the diagonal extraction — same cost
    as :func:`selected_inverse_diag` plus O(npairs d^2) gathers.
    """
    d = plan.d
    pair_a = np.asarray(pair_a, np.int64)
    pair_b = np.asarray(pair_b, np.int64)
    npairs = len(pair_a)

    # host symbolic: locate each vertex's (depth, front, interior slot)
    vdep = np.full(plan.P, -1, np.int64)
    vfront = np.full(plan.P, -1, np.int64)
    vslot = np.full(plan.P, -1, np.int64)
    for dep in range(plan.num_levels):
        dp = plan.depths[dep]
        vdep[dp.va_pid] = dep
        vfront[dp.va_pid] = dp.va_f
        vslot[dp.va_pid] = dp.va_slot

    # per-depth request lists: (front, slot_row, slot_col, out_idx, T?)
    req = [[] for _ in range(plan.num_levels)]
    for k in range(npairs):
        a, b = int(pair_a[k]), int(pair_b[k])
        trans = vdep[b] > vdep[a]  # deeper vertex eliminated first
        if trans:
            a, b = b, a
        dep = int(vdep[a])
        dp = plan.depths[dep]
        f, sa = int(vfront[a]), int(vslot[a])
        if vdep[b] == dep and vfront[b] == f:
            sb = int(vslot[b])
        else:
            hits = np.flatnonzero(dp.bnd_pid[f] == b)
            if len(hits) == 0:
                raise ValueError(
                    f"selected_inverse_pairs: pair ({pair_a[k]}, "
                    f"{pair_b[k]}) is not in the factorization's filled "
                    "pattern — pass only edges of the symbolic graph"
                )
            sb = dp.ni + int(hits[0])
        req[dep].append((f, sa, sb, k, trans))

    L0 = fact[0][0]
    dtype = L0.dtype
    out = jnp.zeros((plan.P, d, d), dtype)
    out_pairs = jnp.zeros((max(npairs, 1), d, d), dtype)
    Sig_prev = None
    for dep in range(plan.num_levels):
        dp = plan.depths[dep]
        Sig_front, nblk = _takahashi_front_cov(plan, fact, dep, Sig_prev,
                                               dtype)
        if len(dp.va_pid):
            blocks = Sig_front.reshape(dp.num_fronts, nblk, d, nblk, d)[
                jnp.asarray(dp.va_f), jnp.asarray(dp.va_slot), :,
                jnp.asarray(dp.va_slot), :
            ]
            out = out.at[jnp.asarray(dp.va_pid)].set(blocks)
        if req[dep]:
            rf = np.asarray([r[0] for r in req[dep]], np.int64)
            ra = np.asarray([r[1] for r in req[dep]], np.int64)
            rb = np.asarray([r[2] for r in req[dep]], np.int64)
            ridx = np.asarray([r[3] for r in req[dep]], np.int64)
            rtr = np.asarray([r[4] for r in req[dep]], bool)
            blk = Sig_front.reshape(dp.num_fronts, nblk, d, nblk, d)[
                jnp.asarray(rf), jnp.asarray(ra), :, jnp.asarray(rb), :
            ]
            blk = jnp.where(
                jnp.asarray(rtr)[:, None, None],
                jnp.swapaxes(blk, -1, -2), blk,
            )
            out_pairs = out_pairs.at[jnp.asarray(ridx)].set(blk)
        Sig_prev = Sig_front
    return out, out_pairs[:npairs]


def _takahashi_front_cov(plan: Plan, fact, dep: int, Sig_prev, dtype):
    """One depth of the Takahashi recurrence: the (nF, m, m) full front
    covariances at ``dep`` given the parent depth's (shared by the
    diagonal and pairwise selected-inverse drivers). Returns
    (Sig_front, nblk)."""
    dp = plan.depths[dep]
    L11, W = fact[dep]
    nblk = dp.ni + dp.nb
    mi = dp.ni * plan.d
    d = plan.d
    eye_i = jnp.broadcast_to(
        jnp.eye(mi, dtype=dtype), (dp.num_fronts, mi, mi)
    )
    Linv = solve_triangular(L11, eye_i, lower=True)
    with _hp():
        Sig11 = jnp.swapaxes(Linv, -1, -2) @ Linv
    if dp.nb:
        pdp = plan.depths[dep - 1]
        m_par = (pdp.ni + pdp.nb) * d
        Psel = _selection(pdp, d, m_par, dtype)
        parent_of = np.zeros(dp.num_fronts, np.int64)
        for fp in range(pdp.num_fronts):
            for k in range(2):
                c = int(pdp.child_of[fp, k])
                if c < dp.num_fronts:
                    parent_of[c] = fp
        Sig_par = Sig_prev[jnp.asarray(parent_of)]
        with _hp():
            Sig_bnd = Psel @ Sig_par @ jnp.swapaxes(Psel, -1, -2)
            G = solve_triangular(L11, W, lower=True, trans=1)
            GS = G @ Sig_bnd
            Sig11 = Sig11 + GS @ jnp.swapaxes(G, -1, -2)
        Sig_front = jnp.concatenate(
            [
                jnp.concatenate([Sig11, -GS], axis=2),
                jnp.concatenate(
                    [-jnp.swapaxes(GS, -1, -2), Sig_bnd], axis=2
                ),
            ],
            axis=1,
        )
    else:
        Sig_front = Sig11
    return Sig_front, nblk


def selected_inverse_diag(plan: Plan, fact) -> Array:
    """Per-vertex diagonal (d, d) blocks of A^{-1} — the multifrontal
    SELECTED INVERSE (Takahashi on the separator tree), top-down:

        Sigma_root = (L L^T)^{-1}
        per front:  G = L11^{-T} W
                    Sigma_11 = L11^{-T} L11^{-1} + G Sigma_bnd G^T
                    Sigma_12 = -G Sigma_bnd

    where Sigma_bnd is gathered from the PARENT front's covariance via
    the same one-hot selection matrices as the factorization's
    extend-add (the child boundary is a subset of the parent's
    vars + bnd). One batched level per tree depth — the covariance
    analog of :func:`factor`, same panel shapes, same MXU mapping.
    Cost and memory match one factorization; this is the marginal
    engine for fat-bandwidth graphs where the RCM-band recurrence
    (pose_graph covariance method='banded') would go near-dense.

    Pass the same ``fact`` returned by :func:`factor`. Returns
    (P, d, d); exactness vs a dense inverse is pinned in
    tests/test_pose_graph_sparse.py.
    """
    d = plan.d
    L0 = fact[0][0]
    dtype = L0.dtype
    out = jnp.zeros((plan.P, d, d), dtype)
    Sig_prev = None  # parent-depth front covariances (nF, m, m)
    for dep in range(plan.num_levels):
        dp = plan.depths[dep]
        Sig_front, nblk = _takahashi_front_cov(plan, fact, dep, Sig_prev,
                                               dtype)
        if len(dp.va_pid):
            blocks = Sig_front.reshape(dp.num_fronts, nblk, d, nblk, d)[
                jnp.asarray(dp.va_f), jnp.asarray(dp.va_slot), :,
                jnp.asarray(dp.va_slot), :
            ]
            out = out.at[jnp.asarray(dp.va_pid)].set(blocks)
        Sig_prev = Sig_front
    return out
