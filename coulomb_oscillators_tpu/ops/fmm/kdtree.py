"""kd-tree FMM force engine, TPU-native.

Reference capability: fmm_cart3_kdtree.cuh (the production engine).  The
design here is a from-scratch TPU formulation:

  * Equal-count median splits (reference evalBox:109-156) make ALL segment
    boundaries compile-time constants: node i at level l covers sorted slots
    [floor(n*i/2^l), floor(n*(i+1)/2^l)).  Leaf occupancy differs by at most
    one slot, so leaves pad to a fixed capacity C with a single static
    gather — no CSR, no dynamic shapes anywhere on device.
  * The per-level segmented sort (reference: bb_segsort) is one
    `jax.lax.sort` with a static segment-id key — lexicographic
    (segment, coordinate) sort IS a segmented sort when segments are
    contiguous.
  * P2M/M2M/M2L/L2L/L2P are the batched table ops of ops.multipole, applied
    per level (python loop at trace time -> one fused XLA program).
  * The dual-tree MAC traversal (reference: persistent-kernel stack,
    :416-567) runs vectorized on host at tree-rebuild time only; its output
    pair lists are padded device arrays reused for `tree_steps` steps
    (temporal amortization, reference :1619-1642; we also freeze centers
    and scales, which is valid because expansion centers are arbitrary and
    we keep dipole terms).
  * P2P runs on fixed-capacity leaf blocks gathered per pair (Newton-3 not
    exploited yet; each unordered pair is emitted in both directions).

MAC (kd_admissible, reference :395-414): pairs (A, B) are far when
(par*Mf)^2 * max(diag2_A, diag2_B) < dist(center_A, center_B)^2 with
Mf = (max(mult_A, mult_B)/n)^(1/(3p+6)).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from coulomb_oscillators_tpu.config import SimConfig
from coulomb_oscillators_tpu.ops.multipole import operators as mop
from coulomb_oscillators_tpu.ops.multipole.tables import FmmTables, build_tables

FAR = 1e18


def auto_level(n: int, p: int, dens_inhom: float = 1.0,
               tree_L: int = 0) -> int:
    """Reference level heuristic (fmm_cart3_kdtree.cuh:1502-1515)."""
    if tree_L > 0:
        L = tree_L
    else:
        L = int(round(math.log2(max(dens_inhom * n / (p * p), 1.0))))
    L = max(2, min(L, 30))
    while (1 << L) > max(n, 2):
        L -= 1
    return max(L, 1)


class FmmState(NamedTuple):
    """Device state frozen between tree rebuilds."""
    perm: jax.Array        # [n] sorted slot -> original particle index
    center: jax.Array      # [Mheap, dim] expansion centers (frozen COC)
    lam: jax.Array         # [Mheap] node length scales (half-diagonal)
    p2p_tgt: jax.Array     # [Kp] leaf index of target
    p2p_src: jax.Array     # [Kp] leaf index of source (=tgt for self)
    p2p_valid: jax.Array   # [Kp] bool
    m2l_tgt: jax.Array     # [Km] heap index of target
    m2l_src: jax.Array     # [Km] heap index of source
    m2l_valid: jax.Array   # [Km] bool


@dataclasses.dataclass
class _Static:
    """Host-side static structure for a given (n, L)."""
    n: int
    L: int
    beg: List[np.ndarray]          # beg[l][i], len 2^l + 1
    seg: List[np.ndarray]          # seg[l][slot] -> segment id (int32)
    C: int                         # leaf capacity
    pad_gather: np.ndarray         # [2^L * C] -> slot (clamped)
    pad_mask: np.ndarray           # [2^L * C] bool
    unpad_gather: np.ndarray       # [n] -> padded slot
    mult: np.ndarray               # [Mheap] node particle counts


@functools.lru_cache(maxsize=32)
def _static_structure(n: int, L: int) -> _Static:
    beg = []
    seg = []
    for l in range(L + 1):
        m = 1 << l
        b = (np.arange(m + 1, dtype=np.int64) * n) // m
        beg.append(b)
        s = np.repeat(np.arange(m, dtype=np.int32), np.diff(b))
        seg.append(s)
    C = -(-n // (1 << L))
    G = 1 << L
    slot = beg[L][:-1][:, None] + np.arange(C)[None, :]      # [G, C]
    mask = slot < beg[L][1:][:, None]
    pad_gather = np.minimum(slot, n - 1).reshape(-1)
    pad_mask = mask.reshape(-1)
    # inverse: sorted slot -> its padded slot
    unpad = np.zeros(n, dtype=np.int64)
    padded_ids = np.arange(G * C)[pad_mask.reshape(-1)]
    unpad[slot.reshape(-1)[pad_mask.reshape(-1)]] = padded_ids
    mult = np.concatenate([np.diff(beg[l]) for l in range(L + 1)]).astype(np.int32)
    return _Static(n=n, L=L, beg=beg, seg=seg, C=C,
                   pad_gather=pad_gather, pad_mask=pad_mask,
                   unpad_gather=unpad, mult=mult)


def _heap_off(l: int) -> int:
    return (1 << l) - 1


# --------------------------------------------------------------------------- #
# Device tree build (sorting + geometry)
# --------------------------------------------------------------------------- #


@functools.partial(jax.jit, static_argnames=("n", "L", "dim"))
def _build_device(pos: jax.Array, n: int, L: int, dim: int):
    """Sort particles into the kd order; return perm + heap geometry."""
    st = _static_structure(n, L)
    pos_s = pos
    perm = jnp.arange(n, dtype=jnp.int32)

    centers, lams, lbs, rbs = [], [], [], []
    for l in range(L + 1):
        m = 1 << l
        seg = jnp.asarray(st.seg[l])
        mn = jax.ops.segment_min(pos_s, seg, num_segments=m,
                                 indices_are_sorted=True)
        mx = jax.ops.segment_max(pos_s, seg, num_segments=m,
                                 indices_are_sorted=True)
        cnt = jnp.asarray(np.diff(st.beg[l]).astype(np.float32))[:, None]
        mean = jax.ops.segment_sum(pos_s, seg, num_segments=m,
                                   indices_are_sorted=True) / cnt
        centers.append(mean)
        lams.append(jnp.maximum(0.5 * jnp.linalg.norm(mx - mn, axis=1), 1e-30))
        lbs.append(mn)
        rbs.append(mx)
        if l == L:
            break
        splitdim = jnp.argmax(mx - mn, axis=1)               # [m]
        key = jnp.take_along_axis(
            pos_s, splitdim[seg][:, None], axis=1)[:, 0]     # [n]
        ops = [seg, key] + [pos_s[:, a] for a in range(dim)] + [perm]
        out = jax.lax.sort(tuple(ops), num_keys=2)
        pos_s = jnp.stack(out[2:2 + dim], axis=1)
        perm = out[2 + dim]

    center = jnp.concatenate(centers, axis=0)
    lam = jnp.concatenate(lams, axis=0)
    lb = jnp.concatenate(lbs, axis=0)
    rb = jnp.concatenate(rbs, axis=0)
    return perm, center, lam, lb, rb


# --------------------------------------------------------------------------- #
# Host dual-tree traversal
# --------------------------------------------------------------------------- #


def _traverse_host(center: np.ndarray, lb: np.ndarray, rb: np.ndarray,
                   mult: np.ndarray, L: int, n: int, p: int,
                   radius: float, coll: bool):
    """Vectorized dual-tree traversal (reference :569-611 semantics).

    Returns (m2l_pairs [K,2] both directions, p2p_pairs [Q,2] both
    directions incl. self pairs).
    """
    leaf0 = _heap_off(L)
    sz = np.sum((rb - lb) ** 2, axis=1)                      # squared diagonal
    mlt_max = mult[leaf0:].max()
    # Mf uses max(mult_i, mult_j); reference takes node mults — for
    # vectorization we use the global bound via per-pair mults below.
    expo = 1.0 / (3 * p + 6)

    frontier = np.array([[0, 0]], dtype=np.int64)
    m2l = []
    p2p = []
    while frontier.size:
        i, j = frontier[:, 0], frontier[:, 1]
        d = center[i] - center[j]
        dist2 = np.sum(d * d, axis=1)
        Mf = (np.maximum(mult[i], mult[j]) / float(n)) ** expo
        parM2 = (radius * Mf) ** 2
        adm = (parM2 * np.maximum(sz[i], sz[j]) < dist2) & (i != j)
        if np.any(adm):
            m2l.append(frontier[adm])
        rest = frontier[~adm]
        if rest.size == 0:
            break
        i, j = rest[:, 0], rest[:, 1]
        leaf_i = i >= leaf0
        leaf_j = j >= leaf0
        both = leaf_i & leaf_j
        if np.any(both):
            p2p.append(rest[both])
        rest = rest[~both]
        if rest.size == 0:
            break
        i, j = rest[:, 0], rest[:, 1]
        leaf_i = i >= leaf0
        leaf_j = j >= leaf0
        # self pairs split into (l,l), (l,r), (r,r) so each unordered pair
        # is emitted exactly once; non-self pairs split the larger non-leaf
        # side only.
        selfp = i == j
        sp = rest[selfp]
        rest = rest[~selfp]
        i, j = rest[:, 0], rest[:, 1]
        leaf_i = i >= leaf0
        leaf_j = j >= leaf0
        split_i = (~leaf_i) & (leaf_j | (sz[i] >= sz[j]))
        si = rest[split_i]
        sj = rest[~split_i]
        nxt = []
        if sp.size:
            a = sp[:, 0]
            l, r = 2 * a + 1, 2 * a + 2
            nxt.append(np.stack([l, l], axis=1))
            nxt.append(np.stack([l, r], axis=1))
            nxt.append(np.stack([r, r], axis=1))
        if si.size:
            a, b = si[:, 0], si[:, 1]
            nxt.append(np.stack([2 * a + 1, b], axis=1))
            nxt.append(np.stack([2 * a + 2, b], axis=1))
        if sj.size:
            a, b = sj[:, 0], sj[:, 1]
            nxt.append(np.stack([a, 2 * b + 1], axis=1))
            nxt.append(np.stack([a, 2 * b + 2], axis=1))
        frontier = np.concatenate(nxt, axis=0) if nxt else np.zeros((0, 2), np.int64)

    m2l = np.concatenate(m2l, axis=0) if m2l else np.zeros((0, 2), np.int64)
    p2p = np.concatenate(p2p, axis=0) if p2p else np.zeros((0, 2), np.int64)
    # both directions
    m2l_full = np.concatenate([m2l, m2l[:, ::-1]], axis=0)
    nonself = p2p[p2p[:, 0] != p2p[:, 1]]
    selfp = p2p[p2p[:, 0] == p2p[:, 1]]
    if not coll:
        p2p_full = np.zeros((0, 2), np.int64)
    else:
        p2p_full = np.concatenate([nonself, nonself[:, ::-1], selfp], axis=0)
        p2p_full = p2p_full - leaf0          # leaf-relative indices
    # sort by target for efficient segment accumulation
    if m2l_full.size:
        m2l_full = m2l_full[np.argsort(m2l_full[:, 0], kind="stable")]
    if p2p_full.size:
        p2p_full = p2p_full[np.argsort(p2p_full[:, 0], kind="stable")]
    return m2l_full, p2p_full


def _pad_pairs(pairs: np.ndarray, cap: int, dummy_tgt: int):
    k = pairs.shape[0]
    tgt = np.full(cap, dummy_tgt, dtype=np.int32)
    src = np.zeros(cap, dtype=np.int32)
    valid = np.zeros(cap, dtype=bool)
    tgt[:k] = pairs[:, 0]
    src[:k] = pairs[:, 1]
    valid[:k] = True
    return tgt, src, valid


def _round_cap(k: int) -> int:
    return max(256, 1 << int(math.ceil(math.log2(max(k, 1) * 1.25))))


# --------------------------------------------------------------------------- #
# Engine
# --------------------------------------------------------------------------- #


class KdFmmEngine:
    """kd-tree FMM engine for a fixed particle count.

    Usage:
        eng = KdFmmEngine(config, n)
        fstate = eng.build(pos)          # at t=0 and every tree_steps steps
        acc = eng.force(pos, fstate)     # pure & jitted
    """

    def __init__(self, config: SimConfig, n: int, L: Optional[int] = None):
        self.config = config
        self.n = n
        self.dim = config.dim
        self.p = max(config.fmm_order, 2)
        self.L = L or auto_level(n, self.p, config.dens_inhom, config.tree_L)
        self.tables = build_tables(self.dim, self.p)
        self.st = _static_structure(n, self.L)
        self.caps = {"p2p": 256, "m2l": 256}
        self._force_jit = jax.jit(self._force_impl)

    # ---------------- build ----------------
    def build(self, pos: jax.Array) -> FmmState:
        perm, center, lam, lb, rb = _build_device(
            pos, self.n, self.L, self.dim)
        c_h = np.asarray(center)
        lb_h, rb_h = np.asarray(lb), np.asarray(rb)
        m2l, p2p = _traverse_host(
            c_h, lb_h, rb_h, self.st.mult, self.L, self.n, self.p,
            float(self.config.tree_radius), self.config.coll)
        self.last_counts = {"m2l": int(m2l.shape[0]), "p2p": int(p2p.shape[0])}
        for name, arr in (("m2l", m2l), ("p2p", p2p)):
            if arr.shape[0] > self.caps[name]:
                self.caps[name] = _round_cap(arr.shape[0])
        Mheap = _heap_off(self.L + 1)
        G = 1 << self.L
        m2l_t, m2l_s, m2l_v = _pad_pairs(m2l, self.caps["m2l"], Mheap)
        p2p_t, p2p_s, p2p_v = _pad_pairs(p2p, self.caps["p2p"], G)
        return FmmState(
            perm=perm, center=center, lam=lam,
            p2p_tgt=jnp.asarray(p2p_t), p2p_src=jnp.asarray(p2p_s),
            p2p_valid=jnp.asarray(p2p_v),
            m2l_tgt=jnp.asarray(m2l_t), m2l_src=jnp.asarray(m2l_s),
            m2l_valid=jnp.asarray(m2l_v),
        )

    # ---------------- force ----------------
    def force(self, pos: jax.Array, fstate: FmmState) -> jax.Array:
        """Coulomb acceleration (unscaled by kappa user handles? no —
        includes kappa) in the ORIGINAL particle order."""
        return self._force_jit(pos, fstate)

    def _force_impl(self, pos: jax.Array, fs: FmmState) -> jax.Array:
        t = self.tables
        st = self.st
        n, L, dim, C = self.n, self.L, self.dim, st.C
        G = 1 << L
        leaf0 = _heap_off(L)
        dtype = pos.dtype
        eps2 = dtype.type(self.config.eps2)
        kappa = dtype.type(self.config.kappa(n))

        pos_s = pos[fs.perm]                                  # [n, dim]
        segL = jnp.asarray(st.seg[L])
        leaf_center = fs.center[leaf0 + segL]                 # [n, dim]
        leaf_lam = fs.lam[leaf0 + segL]                       # [n]

        # ---- P2M (leaves) ----
        e = (pos_s - leaf_center) / leaf_lam[:, None]
        contrib = mop.p2m_contrib(t, e)                       # [n, S_M]
        mpole_leaf = jax.ops.segment_sum(contrib, segL, num_segments=G,
                                         indices_are_sorted=True)

        # ---- M2M up ----
        mpoles = [None] * (L + 1)
        mpoles[L] = mpole_leaf
        for l in range(L - 1, -1, -1):
            m = 1 << l
            off_c = _heap_off(l + 1)
            off_p = _heap_off(l)
            cc = fs.center[off_c:off_c + 2 * m]
            cl = fs.lam[off_c:off_c + 2 * m]
            pc = fs.center[off_p:off_p + m]
            pl = fs.lam[off_p:off_p + m]
            parent_c = jnp.repeat(pc, 2, axis=0)
            parent_l = jnp.repeat(pl, 2, axis=0)
            s = (cc - parent_c) / parent_l[:, None]
            rho = cl / parent_l
            shifted = mop.m2m(t, mpoles[l + 1], s, rho)       # [2m, S_M]
            mpoles[l] = shifted.reshape(m, 2, -1).sum(axis=1)
        mpole_heap = jnp.concatenate(mpoles, axis=0)          # [Mheap, S_M]

        # ---- M2L over pair list (chunked) ----
        Mheap = _heap_off(L + 1)
        Rfull = fs.center[jnp.minimum(fs.m2l_tgt, Mheap - 1)] - \
            fs.center[fs.m2l_src]
        Rsafe = jnp.where(fs.m2l_valid[:, None], Rfull, jnp.ones_like(Rfull))
        lam_s = fs.lam[fs.m2l_src]
        lam_t = fs.lam[jnp.minimum(fs.m2l_tgt, Mheap - 1)]
        Msrc = mpole_heap[fs.m2l_src]

        chunk = 8192
        K = Rsafe.shape[0]
        kpad = -(-K // chunk) * chunk

        def pad0(x):
            return jnp.pad(x, [(0, kpad - K)] + [(0, 0)] * (x.ndim - 1))

        Mc = pad0(Msrc).reshape(kpad // chunk, chunk, -1)
        Rc = pad0(Rsafe).reshape(kpad // chunk, chunk, dim)
        lsc = pad0(lam_s).reshape(kpad // chunk, chunk)
        ltc = pad0(lam_t).reshape(kpad // chunk, chunk)
        vc = pad0(fs.m2l_valid).reshape(kpad // chunk, chunk)

        def m2l_chunk(args):
            Mx, Rx, ls, lt, vv = args
            out = mop.m2l(t, Mx, Rx, ls, lt)
            return out * vv[:, None]

        Lc = jax.lax.map(m2l_chunk, (Mc, Rc, lsc, ltc, vc))
        Lcontrib = Lc.reshape(kpad, -1)[:K]
        local_heap = jax.ops.segment_sum(
            Lcontrib, fs.m2l_tgt, num_segments=Mheap + 1,
            indices_are_sorted=True)[:Mheap]

        # ---- L2L down ----
        locs = local_heap[0:1]
        local_levels = [locs]
        for l in range(1, L + 1):
            m = 1 << l
            off = _heap_off(l)
            off_p = _heap_off(l - 1)
            cc = fs.center[off:off + m]
            cl = fs.lam[off:off + m]
            pc = jnp.repeat(fs.center[off_p:off_p + m // 2], 2, axis=0)
            pl = jnp.repeat(fs.lam[off_p:off_p + m // 2], 2, axis=0)
            s = (cc - pc) / pl[:, None]
            rho = cl / pl
            parentL = jnp.repeat(local_levels[l - 1], 2, axis=0)
            shifted = mop.l2l(t, parentL, s, rho)
            locs = shifted + local_heap[off:off + m]
            local_levels.append(locs)
        leaf_local = local_levels[L]                          # [G, S_Lt]

        # ---- L2P ----
        w = (pos_s - leaf_center) / leaf_lam[:, None]
        Lt_per_particle = leaf_local[segL]
        acc_far = mop.l2p_field(t, Lt_per_particle, w, leaf_lam)

        # ---- P2P on padded leaf blocks ----
        pad_gather = jnp.asarray(st.pad_gather)
        pad_mask = jnp.asarray(st.pad_mask)
        pos_pad = jnp.where(pad_mask[:, None], pos_s[pad_gather],
                            dtype.type(FAR)).reshape(G, C, dim)

        tgt = jnp.minimum(fs.p2p_tgt, G - 1)
        src = fs.p2p_src

        pchunk = 512
        Q = tgt.shape[0]
        qpad = -(-Q // pchunk) * pchunk
        tgt_c = jnp.pad(tgt, (0, qpad - Q)).reshape(-1, pchunk)
        src_c = jnp.pad(src, (0, qpad - Q)).reshape(-1, pchunk)
        val_c = jnp.pad(fs.p2p_valid, (0, qpad - Q)).reshape(-1, pchunk)

        def p2p_chunk(args):
            ti, si, vv = args
            P_t = pos_pad[ti]                                 # [pc, C, dim]
            P_s = pos_pad[si]
            acc = jnp.zeros_like(P_t)
            dist2 = eps2
            ds = []
            for a in range(dim):
                da = P_t[:, :, None, a] - P_s[:, None, :, a]  # [pc, C, C]
                ds.append(da)
                dist2 = dist2 + da * da
            inv = 1.0 / dist2
            if dim == 3:
                wgt = inv * jax.lax.rsqrt(dist2)
            else:
                wgt = inv
            wgt = wgt * vv[:, None, None]
            comps = [jnp.sum(ds[a] * wgt, axis=2) for a in range(dim)]
            return jnp.stack(comps, axis=-1)                  # [pc, C, dim]

        fchunks = jax.lax.map(p2p_chunk, (tgt_c, src_c, val_c))
        fpairs = fchunks.reshape(qpad, C, dim)[:Q]
        acc_pad = jax.ops.segment_sum(fpairs, tgt, num_segments=G,
                                      indices_are_sorted=True)
        acc_near = acc_pad.reshape(G * C, dim)[jnp.asarray(st.unpad_gather)]

        acc_s = (acc_far + acc_near) * kappa
        acc = jnp.zeros_like(acc_s).at[fs.perm].set(acc_s)
        return acc


# --------------------------------------------------------------------------- #
# registry hook for models.oscillator
# --------------------------------------------------------------------------- #


def make_engine(config: SimConfig, n: int, name: str):
    """Return a pos -> acc callable (rebuilds the tree every call; for the
    amortized path use KdFmmEngine directly)."""
    if name in ("fmm3_kd", "fmm2_kd", "fmm_kd"):
        eng = KdFmmEngine(config, n)

        def force(pos):
            fstate = eng.build(pos)
            return eng.force(pos, fstate)

        force.engine = eng
        return force
    raise ValueError(f"unknown FMM engine {name!r}")
