"""Executable specification of the reference mapper's semantics.

This module is a from-scratch Python re-derivation of WHAT the reference
(AnamarijaKic/bioinfo1, mounted at /root/reference) computes.  It is the
authoritative oracle that every TPU kernel in this framework is tested
against.  It is intentionally written for clarity and exactness, not speed.

Semantics covered (reference citations refer to files under /root/reference):

* 2-bit base encoding with the reference's non-standard alphabet order
  C=0 < A=1 < T=2 < G=3, MSB-first packing (team_minimizers.cpp:70-86).
  Unknown characters map to 0 (C++ ``unordered_map::operator[]`` default).
* Minimizer extraction with prefix/suffix end-windows, leftmost tie-break,
  1-based positions, duplicate retention, per-window frequency histogram and
  unique-tuple set (team_minimizers.cpp:122-225).
* Order-preserving duplicate removal (team_mapper.cpp:28-45).
* Reference index build over forward strand and reverse complement with the
  top-``int(f * |unique tuples|)`` frequency ban (team_mapper.cpp:410-477).
* Seed matching (team_mapper.cpp:627-638 FASTA branch / 716-729 FASTQ branch).
* O(n^2) LIS chaining with 5000 gap caps and unsigned-wrap semantics
  (team_mapper.cpp:283-316).
* Needleman-Wunsch / Smith-Waterman / semi-global DP alignment with linear
  gaps, M>I>D tie priority, and the reference's CIGAR convention where ``I``
  consumes the target and ``D`` consumes the query (team_alignment.cpp:49-350).
* PAF emission (team_mapper.cpp:685-698, 777-789).

Known reference bugs are NOT replicated by default; each has a ``bug_compat``
style switch so parity tests against the compiled reference binary can turn
them back on.  The deltas (SURVEY.md section 2.3 item 11):

1. ``banned_rev_from_fwd`` - the reverse-strand banned set is filled from the
   *forward* frequency vector (team_mapper.cpp:469).
2. ``fasta_match_nesting`` - in the FASTA branch, reverse-index lookups only
   happen when the hash is present in the forward index (team_mapper.cpp:629-638).
3. ``local_target_begin_end`` - local alignment reports ``target_begin`` as
   the 1-based *end* column instead of the start (team_alignment.cpp:196-199).
4. Prefix end-windows read out of bounds for sequences shorter than
   ``w + k - 2`` (team_minimizers.cpp:146-170).  Undefined behaviour cannot be
   replicated; this model clamps the window to valid k-mers instead.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Encoding (reference: team_minimizers.cpp:70-86)
# ---------------------------------------------------------------------------

#: Reference alphabet order: C < A < T < G.  Everything else encodes as 0.
BASE_CODE = {"C": 0, "A": 1, "T": 2, "G": 3}

#: Complement map used by ReverseComplement (team_mapper.cpp:49-63).  Bases
#: outside ACGT are left unchanged, exactly like the C++ switch statement.
COMPLEMENT = {"A": "T", "T": "A", "G": "C", "C": "G"}


def encode_base(c: str) -> int:
    return BASE_CODE.get(c, 0)


def kmer_hash(seq: str, start: int, k: int) -> int:
    """MSB-first 2-bit packing of ``seq[start:start+k]`` into an int.

    Matches KMER::MappSeqCharPointerToBit (team_minimizers.cpp:70-86): the
    hash *is* the lexicographic rank of the k-mer under C<A<T<G.
    """
    h = 0
    for i in range(start, start + k):
        h = ((h << 2) | encode_base(seq[i])) & 0xFFFFFFFF
    return h


def reverse_complement(seq: str) -> str:
    """Reverse then complement; non-ACGT chars pass through unchanged."""
    return "".join(COMPLEMENT.get(c, c) for c in reversed(seq))


# ---------------------------------------------------------------------------
# Minimizers (reference: team_minimizers.cpp:122-225)
# ---------------------------------------------------------------------------

Minimizer = Tuple[int, int, bool]  # (hash, 1-based position, is_forward)


@dataclasses.dataclass
class MinimizeResult:
    """Mirror of KMER state after one Minimize() call."""

    minimizers: List[Minimizer]          # with duplicates, in emit order
    frequencies: Dict[int, int]          # hash -> number of windows won
    unique: Set[Minimizer]               # distinct (hash, pos, strand)


def minimize(seq: str, k: int, w: int, is_fwd: bool = True,
             count_frequencies: bool = True,
             oob_end_windows: bool = False) -> MinimizeResult:
    """Reference minimizer sweep: prefix end-windows of 1..w-1 k-mers, dense
    windows of w k-mers, suffix end-windows of 1..w-1 k-mers.

    Positions are 1-based.  Tie-break within a window is the leftmost k-mer
    (strict ``<`` scan, team_minimizers.cpp:106-120).  The emit order below
    is exactly the reference's and is load-bearing: it determines the order
    of seed matches fed into LIS chaining.

    ``oob_end_windows=True`` replicates reference bug #4: the prefix
    end-window loop has no length guard (team_minimizers.cpp:146-170), so
    for sequences shorter than w+k-2 it hashes k-mers extending past the
    end.  The first overrun byte is the guaranteed c_str() NUL, which the
    base map encodes as 0 - so NUL(=code 0)-extension reproduces the
    reference bit-for-bit whenever the overrun is 1 byte (deeper overruns
    are true UB on heap bytes; 0-fill is the best-effort stand-in).
    """
    L = len(seq)
    out = MinimizeResult([], {}, set())
    if L < k or w == 0:
        return out

    # Extended hash array covers OOB prefix k-mers (start up to w-2) by
    # 0-padding the sequence; entries beyond nk-1 are only reachable in
    # oob_end_windows mode.
    ext = seq + "\0" * (w - 1)
    hashes = [kmer_hash(ext, i, k) for i in range(L - k + 1 + (w - 1))]
    nk = L - k + 1  # number of in-bounds k-mers

    def emit(kmer_indices: Sequence[int]) -> None:
        best_i = min(kmer_indices, key=lambda i: hashes[i])
        m = (hashes[best_i], best_i + 1, is_fwd)
        out.minimizers.append(m)
        out.unique.add(m)
        if count_frequencies:
            out.frequencies[m[0]] = out.frequencies.get(m[0], 0) + 1

    # Prefix end-windows: u = k .. w+k-2 covers k-mers [0, u-k].
    for u in range(k, w + k - 1):
        hi = u - k if oob_end_windows else min(u - k, nk - 1)
        emit(range(0, hi + 1))

    # Dense windows of exactly w k-mers, emitted once w k-mers are buffered.
    for i in range(w - 1, nk):
        emit(range(i - w + 1, i + 1))

    # Suffix end-windows: u = k .. w+k-2, window covers k-mers [L-u, L-k],
    # guarded by ``if (sequence_len < u) break`` (team_minimizers.cpp:198).
    for u in range(k, w + k - 1):
        if L < u:
            break
        emit(range(L - u, nk))

    return out


def remove_duplicates(minimizers: Sequence[Minimizer]) -> List[Minimizer]:
    """Order-preserving removal of exact duplicate tuples (team_mapper.cpp:28-45)."""
    seen: Set[Minimizer] = set()
    result = []
    for m in minimizers:
        if m not in seen:
            seen.add(m)
            result.append(m)
    return result


# ---------------------------------------------------------------------------
# Reference index (reference: team_mapper.cpp:410-477)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class StrandIndex:
    """hash -> ascending list of unique positions (C++ set<pair<pos,bool>>)."""

    index: Dict[int, List[int]]
    frequencies: Dict[int, int]
    banned: Set[int]
    n_unique_tuples: int


@dataclasses.dataclass
class ReferenceIndex:
    fwd: StrandIndex
    rev: StrandIndex
    reference: str
    reference_rc: str
    k: int
    w: int


def _ban_top(freqs: Dict[int, int], threshold: int,
             order_freqs: Optional[Dict[int, int]] = None) -> Set[int]:
    """Top-``threshold`` hashes by descending window count.

    The C++ sorts an unordered_map-derived vector with an unstable sort and
    no tie rule, so the tie order among equal counts is unspecified there.
    We define it deterministically: (count desc, hash asc).

    ``order_freqs`` replicates reference bug #1: the loop bound comes from
    this strand's vector (``min(threshold, |freqs|)``, team_mapper.cpp:468)
    but the hashes are drawn from the *forward* ranking (team_mapper.cpp:469).
    """
    count = max(0, min(threshold, len(freqs)))
    src = order_freqs if order_freqs is not None else freqs
    ranked = sorted(src.items(), key=lambda kv: (-kv[1], kv[0]))
    return {h for h, _ in ranked[:count]}


def build_index(reference: str, k: int, w: int, f: float,
                banned_rev_from_fwd: bool = False,
                threshold_from_rev_unique: bool = False,
                oob_end_windows: bool = False) -> ReferenceIndex:
    """Build forward + reverse-complement minimizer indexes with frequency ban.

    The threshold is ``int(f * |unique (hash,pos,strand) tuples|)`` per strand
    (team_mapper.cpp:433-434) - scaled by unique *tuple* count, not distinct
    hash count.  ``banned_rev_from_fwd=True`` replicates reference bug #1.

    ``threshold_from_rev_unique=True`` replicates a further latent reference
    bug: KMER's ``unique_minmizers`` set is a namespace-scope GLOBAL shared by
    every instance (team_minimizers.cpp:19-22), and main() calls
    ``ref.GetUniqueMinimizers()`` only AFTER ``ref_rev.Minimize()`` overwrote
    it (team_mapper.cpp:417-434) - so BOTH thresholds are actually scaled by
    the reverse strand's unique-tuple count.
    """
    fwd_res = minimize(reference, k, w, is_fwd=True,
                       oob_end_windows=oob_end_windows)
    rc = reverse_complement(reference)
    rev_res = minimize(rc, k, w, is_fwd=False,
                       oob_end_windows=oob_end_windows)

    thr_rev = int(f * len(rev_res.unique))
    thr_fwd = thr_rev if threshold_from_rev_unique else int(f * len(fwd_res.unique))

    banned_fwd = _ban_top(fwd_res.frequencies, thr_fwd)
    banned_rev = _ban_top(
        rev_res.frequencies, thr_rev,
        order_freqs=fwd_res.frequencies if banned_rev_from_fwd else None)

    def make(strand_res: MinimizeResult, banned: Set[int],
             thr_unused: int) -> StrandIndex:
        idx: Dict[int, Set[int]] = {}
        for h, pos, _ in strand_res.minimizers:
            if h not in banned:
                idx.setdefault(h, set()).add(pos)
        return StrandIndex(
            index={h: sorted(ps) for h, ps in idx.items()},
            frequencies=dict(strand_res.frequencies),
            banned=banned,
            n_unique_tuples=len(strand_res.unique),
        )

    return ReferenceIndex(
        fwd=make(fwd_res, banned_fwd, thr_fwd),
        rev=make(rev_res, banned_rev, thr_rev),
        reference=reference,
        reference_rc=rc,
        k=k,
        w=w,
    )


# ---------------------------------------------------------------------------
# Seed matching (reference: team_mapper.cpp:627-638 / 716-729)
# ---------------------------------------------------------------------------


def find_matches(frag_min: Sequence[Minimizer], index: ReferenceIndex,
                 fasta_match_nesting: bool = False,
                 ) -> Tuple[List[Tuple[int, int]], List[Tuple[int, int]]]:
    """Collect (fragment_pos, reference_pos) match lists per strand.

    Default semantics = the FASTQ branch (independent fwd/rev lookups).
    ``fasta_match_nesting=True`` replicates reference bug #2 where the
    reverse lookup is nested inside the forward-hit condition.
    """
    matches_fwd: List[Tuple[int, int]] = []
    matches_rev: List[Tuple[int, int]] = []
    for h, f_pos, _ in frag_min:
        in_fwd = h in index.fwd.index
        if in_fwd:
            for r_pos in index.fwd.index[h]:
                matches_fwd.append((f_pos, r_pos))
        if fasta_match_nesting:
            if in_fwd:
                for r_pos in index.rev.index.get(h, ()):
                    matches_rev.append((f_pos, r_pos))
        else:
            for r_pos in index.rev.index.get(h, ()):
                matches_rev.append((f_pos, r_pos))
    return matches_fwd, matches_rev


# ---------------------------------------------------------------------------
# LIS chaining (reference: team_mapper.cpp:283-316)
# ---------------------------------------------------------------------------

_GAP_CAP = 5000


def find_lis(matches: Sequence[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """O(n^2) LIS over matches in their given order.

    A predecessor j of i must satisfy (team_mapper.cpp:295-296):
      * r_i > r_j and (r_i - r_j) < 5000,
      * f_i != f_j and (f_i - f_j) mod 2^32 < 5000 - the operands are
        ``unsigned int`` so f_i < f_j wraps and fails the cap; together the
        two clauses mean  f_j < f_i < f_j + 5000.
    ``lis[i]`` improves only strictly, so the earliest qualifying j with the
    maximal lis[j] becomes prev[i]; the chain end is the first argmax of lis.
    """
    n = len(matches)
    if n == 0:
        return []
    lis = [1] * n
    prev = [-1] * n
    for i in range(1, n):
        fi, ri = matches[i]
        for j in range(i):
            fj, rj = matches[j]
            if (ri > rj and lis[i] < lis[j] + 1 and fi != fj
                    and (fi - fj) % (1 << 32) < _GAP_CAP
                    and (ri - rj) < _GAP_CAP):
                lis[i] = lis[j] + 1
                prev[i] = j
    max_index = max(range(n), key=lambda i: lis[i])  # first argmax
    # Python's max with key returns the first maximal element, matching
    # std::max_element.
    chain = []
    i = max_index
    while True:
        chain.append(matches[i])
        if prev[i] == -1:
            break
        i = prev[i]
    chain.reverse()
    return chain


# ---------------------------------------------------------------------------
# Pairwise alignment (reference: team_alignment.cpp:49-350)
# ---------------------------------------------------------------------------

_M, _I, _D = 0, 1, 2  # parent codes, tie priority M > I > D

ALIGNMENT_TYPES = ("global", "local", "semiGlobal")


def _indel_cost(c: str, gap: int) -> int:
    """indel() (team_alignment.cpp:25-28): literal '-' chars cost 0."""
    return 0 if c == "-" else gap


def _fill_matrix(query: str, target: str, typ: str,
                 match: int, mismatch: int, gap: int) -> np.ndarray:
    """Row-scan DP fill returning the (n+1, m+1) cost matrix.

    Vectorized along each row.  The left-neighbour dependency within a row is
    resolved with the running-max identity
        H[i,j] = max(c[j], H[i,j-1] + g)  ==>  H[i,j] = j*g + cummax(c[l]-l*g)
    which holds for any integer g.  Local clamping folds in as c'=max(c,0)
    because H[i,l] >= 0 always in local mode.  Parents are recomputed later
    from the final costs; that reproduces the reference's stored parents
    because the reference derives parent from the same three candidates with
    the same M>I>D first-strictly-greater rule (team_alignment.cpp:104-114).
    """
    n, m = len(query), len(target)
    init = gap if typ == "global" else 0
    H = np.zeros((n + 1, m + 1), dtype=np.int64)
    H[:, 0] = np.arange(n + 1, dtype=np.int64) * init
    H[0, :] = np.arange(m + 1, dtype=np.int64) * init

    q = np.frombuffer(query.encode("latin1"), dtype=np.uint8)
    t = np.frombuffer(target.encode("latin1"), dtype=np.uint8)
    ins_cost = np.where(t == ord("-"), 0, gap).astype(np.int64)  # per column j
    j_idx = np.arange(1, m + 1, dtype=np.int64)

    for i in range(1, n + 1):
        sub = np.where(t == q[i - 1], match, mismatch).astype(np.int64)
        del_cost = _indel_cost(query[i - 1], gap)
        c = np.maximum(H[i - 1, :-1] + sub, H[i - 1, 1:] + del_cost)
        if typ == "local":
            c = np.maximum(c, 0)
        # H[i,j] = max(c[j], H[i,j-1] + ins_cost[j]); ins cost is uniform gap
        # unless the target char is '-'.  With non-uniform ins costs the
        # cummax identity needs the prefix sums of ins_cost.
        g_prefix = np.concatenate(([0], np.cumsum(ins_cost)))  # len m+1
        # H[i,j] = max over l<=j of (c[l] + sum(ins[l+1..j])), seeded by H[i,0]
        base = np.concatenate(([H[i, 0]], c)) - g_prefix
        row = np.maximum.accumulate(base)[1:] + g_prefix[1:]
        if typ == "local":
            row = np.maximum(row, 0)
        H[i, 1:] = row
    return H


def _recompute_parent(H: np.ndarray, query: str, target: str, i: int, j: int,
                      match: int, mismatch: int, gap: int) -> int:
    """Parent of interior/boundary cell (i, j) under M>I>D priority."""
    if i == 0:
        return _I
    if j == 0:
        return _D
    diag = H[i - 1, j - 1] + (match if query[i - 1] == target[j - 1] else mismatch)
    left = H[i, j - 1] + _indel_cost(target[j - 1], gap)
    up = H[i - 1, j] + _indel_cost(query[i - 1], gap)
    best = max(diag, left, up)
    if diag == best:
        return _M
    if left == best:
        return _I
    return _D


def _compress_cigar(ops: str) -> str:
    """Run-length compress an op string (team_alignment.cpp:145-160)."""
    if not ops:
        # The reference indexes result[0] unconditionally - UB on empty
        # tracebacks.  We return the empty string instead (documented delta).
        return ""
    out = []
    prev, count = ops[0], 1
    for c in ops[1:]:
        if c == prev:
            count += 1
        else:
            out.append(f"{count}{prev}")
            prev, count = c, 1
    out.append(f"{count}{prev}")
    return "".join(out)


@dataclasses.dataclass
class AlignResult:
    score: int
    cigar: Optional[str]
    target_begin: Optional[int]


def align(query: str, target: str, typ: str, match: int, mismatch: int,
          gap: int, want_cigar: bool = True,
          local_target_begin_end: bool = False) -> AlignResult:
    """Reference-exact pairwise DP alignment.

    CIGAR convention is the reference's: ``I`` consumes the target, ``D``
    consumes the query (opposite of SAM; team_alignment.cpp:128-137).
    ``local_target_begin_end=True`` replicates reference bug #3 where local
    ``target_begin`` is the 1-based end column; the fixed default reports the
    0-based start column of the local alignment on the target.

    Stale-``j`` adjudication (SURVEY.md 2.3 #11; VERDICT r02 item 7): the
    reference's semiGlobal traceback tests ``j > 0`` instead of
    ``global_j > 0`` in its INSERT branch (team_alignment.cpp:292).  This is
    PROVABLY UNOBSERVABLE, so no bug-compat switch exists for it:
    (a) at traceback time the stale fill-loop counter always holds
    ``j == target_len + 1 >= 1``, so the condition is constant-true and the
    branch reduces to the parent test alone;
    (b) the only cells where the intended ``global_j > 0`` guard would
    differ are column-0 cells (global_j == 0) with global_i > 0 - and every
    such cell has ``parent == DELETE`` from initialization
    (team_alignment.cpp:83-86), never overwritten by the fill loop (which
    only writes j >= 1), so the ``parent == INSERT`` test fails there and
    the DELETE branch fires exactly as it would with the fixed guard.
    Hence our fixed ``j > 0`` guard below is byte-equivalent to the
    reference for every input.
    """
    if typ not in ALIGNMENT_TYPES:
        raise ValueError("Unknown AlignmentType provided.")
    n, m = len(query), len(target)
    H = _fill_matrix(query, target, typ, match, mismatch, gap)

    if typ == "global":
        gi, gj = n, m
        target_begin = 0
    elif typ == "local":
        # First strictly-greater max in row-major scan order over cells
        # (1..n, 1..m): max cost, then smallest (i, j).
        sub = H[1:, 1:]
        best = int(sub.max()) if sub.size else 0
        if sub.size:
            flat = int(np.argmax(sub))  # first occurrence in row-major order
            gi, gj = flat // m + 1, flat % m + 1
        else:
            gi = gj = 0
        target_begin = gj + 1 if local_target_begin_end else None  # fixed later
    else:  # semiGlobal
        col = H[:, m]
        row = H[n, :]
        ci = int(np.argmax(col))
        rj = int(np.argmax(row))
        if row[rj] > col[ci]:
            gi, gj = n, rj
        else:
            gi, gj = ci, m
        target_begin = 0

    score = int(H[gi, gj])

    cigar = None
    if want_cigar:
        ops_rev = []
        i, j = gi, gj
        if typ == "local":
            while H[i, j] > 0:
                p = _recompute_parent(H, query, target, i, j, match, mismatch, gap)
                if p == _M:
                    ops_rev.append("M"); i -= 1; j -= 1
                elif p == _I:
                    ops_rev.append("I"); j -= 1
                else:
                    ops_rev.append("D"); i -= 1
            if not local_target_begin_end:
                target_begin = j  # 0-based start column (fixed semantics)
        else:
            while i > 0 or j > 0:
                p = _recompute_parent(H, query, target, i, j, match, mismatch, gap)
                if i > 0 and j > 0 and p == _M:
                    ops_rev.append("M"); i -= 1; j -= 1
                elif j > 0 and p == _I:
                    ops_rev.append("I"); j -= 1
                elif i > 0 and p == _D:
                    ops_rev.append("D"); i -= 1
                else:  # pragma: no cover - unreachable with valid parents
                    raise ValueError("Unknown error in determining cigar string.")
        ops = "".join(reversed(ops_rev))
        if typ == "semiGlobal" and (gj != m or gi != n):
            # Pad to the corner (team_alignment.cpp:306-315): trailing I if the
            # goal sits in the last row, trailing D if in the last column.
            if gi == n:
                ops += "I" * (m - gj)
            elif gj == m:
                ops += "D" * (n - gi)
        cigar = _compress_cigar(ops)
    elif typ == "local" and not local_target_begin_end:
        # Without a traceback the fixed start column is unknown; mirror the
        # reference in reporting only what the fill determined.
        target_begin = None

    return AlignResult(score=score, cigar=cigar, target_begin=target_begin)


# ---------------------------------------------------------------------------
# End-to-end mapping (reference: team_mapper.cpp main loop)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MapperParams:
    align_type: str = "global"
    match: int = 1
    mismatch: int = -1
    gap: int = -1
    k: int = 15
    w: int = 5
    f: float = 0.001
    output_cigar: bool = False
    # bug-compat switches (all False = fixed semantics)
    banned_rev_from_fwd: bool = False
    fasta_match_nesting: bool = False
    local_target_begin_end: bool = False
    oob_end_windows: bool = False


def map_read(name: str, seq: str, index: ReferenceIndex, ref_name: str,
             params: MapperParams) -> Optional[str]:
    """Map one read; returns the PAF line or None when no chain exists."""
    frag = minimize(seq, index.k, index.w, is_fwd=True,
                    count_frequencies=False,
                    oob_end_windows=params.oob_end_windows)
    frag_min = remove_duplicates(frag.minimizers)
    matches_fwd, matches_rev = find_matches(
        frag_min, index, fasta_match_nesting=params.fasta_match_nesting)
    chain_fwd = find_lis(matches_fwd)
    chain_rev = find_lis(matches_rev)
    chain = chain_fwd if len(chain_fwd) >= len(chain_rev) else chain_rev
    if not chain:
        return None
    is_fwd = chain == chain_fwd  # vector equality, like the C++
    k = index.k
    q_begin = chain[0][0] - 1
    q_end = chain[-1][0] + k - 2
    t_begin = chain[0][1] - 1
    t_end = chain[-1][1] + k - 2

    target_str = index.reference if is_fwd else index.reference_rc
    # OOB chain coordinates (bug #4) read past the end; the reference's
    # pointer arithmetic picks up the c_str NUL - pad with '\0'.
    q_str = seq[q_begin:q_end + 1]
    q_str += "\0" * (q_end - q_begin + 1 - len(q_str))
    t_str = target_str[t_begin:t_end + 1]
    t_str += "\0" * (t_end - t_begin + 1 - len(t_str))
    res = align(q_str, t_str,
                params.align_type, params.match, params.mismatch, params.gap,
                want_cigar=params.output_cigar,
                local_target_begin_end=params.local_target_begin_end)

    ref_len = len(index.reference)
    if is_fwd:
        t_start_out, t_end_out = t_begin, t_end + 1
    else:
        t_start_out = ref_len - t_end - 1
        t_end_out = ref_len - t_begin
    fields = [
        name, str(len(seq)), str(q_begin), str(q_end + 1),
        "+" if is_fwd else "-", ref_name, str(ref_len),
        str(t_start_out), str(t_end_out),
        str(res.score), str(q_end - q_begin + 1), "60",
    ]
    if params.output_cigar:
        fields.append(f"cg:Z:{res.cigar}")
    return "\t".join(fields)


def map_all(reference_records: Sequence[Tuple[str, str]],
            read_records: Sequence[Tuple[str, str]],
            params: MapperParams) -> List[str]:
    """Full pipeline over (name, sequence) record lists, deterministic order.

    Only the first reference record's name/sequence is used, mirroring
    ``referenceSequence.front()`` (team_mapper.cpp:415, quirk #10).  Output
    order is input order (documented delta from the reference's
    nondeterministic ``omp critical`` interleaving).
    """
    ref_name, reference = reference_records[0]
    index = build_index(reference, params.k, params.w, params.f,
                        banned_rev_from_fwd=params.banned_rev_from_fwd,
                        oob_end_windows=params.oob_end_windows)
    out = []
    for name, seq in read_records:
        line = map_read(name, seq, index, ref_name, params)
        if line is not None:
            out.append(line)
    return out
