"""Parity tests: the executable spec (reference_model) vs the compiled
reference binary, on the bundled micro examples and randomized inputs.

The binary is run with OMP_NUM_THREADS=1 so its output order is input order,
and the spec is run with all bug-compat switches ON (the binary has the bugs).
"""

import random

import pytest

from bioinfo1_tpu import reference_model as rm
from bioinfo1_tpu.io import fastx
from tests.conftest import REFERENCE_DIR, run_oracle

REF_EXAMPLES = [
    ("ref.fasta", "seq.fasta.txt"),
    ("reference.fasta", "dokumentacija_primjer.fasta.txt"),
    ("reference.fasta", "seq.fasta.txt"),
    ("ref.fasta", "dokumentacija_primjer.fasta.txt"),
]

PARAM_SETS = [
    # (align_type, match, mismatch, gap, k, w, f, cigar)
    ("global", 1, -1, -1, 3, 2, 0.0, True),
    ("local", 2, -1, 2, 3, 2, 0.0, True),   # the report's worked example params
    ("semiGlobal", 1, -1, -1, 3, 2, 0.0, True),
    ("global", 2, -2, -3, 4, 3, 0.0, True),
    ("global", 1, -1, -1, 3, 2, 0.0, False),
]


def _bug_params(align_type, match, mismatch, gap, k, w, f, cigar):
    return rm.MapperParams(
        align_type=align_type, match=match, mismatch=mismatch, gap=gap,
        k=k, w=w, f=f, output_cigar=cigar,
        banned_rev_from_fwd=True, fasta_match_nesting=True,
        local_target_begin_end=True)


def _oracle_args(align_type, match, mismatch, gap, k, w, f, cigar,
                 ref_path, reads_path):
    args = ["-a", align_type, "-m", str(match), "-n", str(mismatch),
            "-g", str(gap), "-k", str(k), "-w", str(w), "-f", str(f)]
    if cigar:
        args.append("-c")
    args += [ref_path, reads_path]
    return args


@pytest.mark.parametrize("ref_file,reads_file", REF_EXAMPLES)
@pytest.mark.parametrize("params", PARAM_SETS)
def test_map_parity_bundled_examples(oracle_bin, tmp_path, ref_file,
                                     reads_file, params):
    ref_path = f"{REFERENCE_DIR}/{ref_file}"
    reads_path = f"{REFERENCE_DIR}/{reads_file}"
    proc = run_oracle(oracle_bin,
                      _oracle_args(*params, ref_path, reads_path))
    assert proc.returncode == 0, proc.stderr
    expected = [l for l in proc.stdout.splitlines() if l]

    refs = fastx.parse_fasta(ref_path)
    reads = fastx.parse_reads(reads_path).records
    got = rm.map_all(refs, reads, _bug_params(*params))
    assert got == expected


def _random_genome(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _mutate(rng, seq, sub=0.05, indel=0.02):
    out = []
    for c in seq:
        r = rng.random()
        if r < indel / 2:
            continue  # deletion
        if r < indel:
            out.append(rng.choice("ACGT"))  # insertion
        if rng.random() < sub:
            out.append(rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("align_type", ["global", "local", "semiGlobal"])
def test_map_parity_random_fasta(oracle_bin, tmp_path, seed, align_type):
    """Random genome + mutated reads (both strands), FASTA input path."""
    rng = random.Random(seed)
    genome = _random_genome(rng, 2000)
    reads = []
    for i in range(12):
        start = rng.randrange(0, len(genome) - 300)
        frag = _mutate(rng, genome[start:start + rng.randrange(120, 300)])
        if rng.random() < 0.5:
            frag = rm.reverse_complement(frag)
        reads.append((f"read{i}", frag))

    ref_path = tmp_path / "ref.fasta"
    reads_path = tmp_path / "reads.fasta"
    ref_path.write_text(">genome desc here\n" + genome + "\n")
    reads_path.write_text(
        "".join(f">{n}\n{s}\n" for n, s in reads))

    params = (align_type, 1, -1, -1, 15, 5, 0.0, True)
    proc = run_oracle(oracle_bin,
                      _oracle_args(*params, str(ref_path), str(reads_path)))
    assert proc.returncode == 0, proc.stderr
    expected = [l for l in proc.stdout.splitlines() if l]
    assert expected, "oracle produced no mappings - test inputs too hard"

    got = rm.map_all(fastx.parse_fasta(str(ref_path)), reads,
                     _bug_params(*params))
    assert got == expected


@pytest.mark.parametrize("seed", [7, 8])
def test_map_parity_random_fastq(oracle_bin, tmp_path, seed):
    """FASTQ input path exercises the independent fwd/rev match lookups."""
    rng = random.Random(seed)
    genome = _random_genome(rng, 1500)
    reads = []
    for i in range(10):
        start = rng.randrange(0, len(genome) - 200)
        frag = _mutate(rng, genome[start:start + rng.randrange(100, 200)])
        if rng.random() < 0.5:
            frag = rm.reverse_complement(frag)
        reads.append((f"r{i}", frag))

    ref_path = tmp_path / "ref.fasta"
    reads_path = tmp_path / "reads.fastq"
    ref_path.write_text(">genome\n" + genome + "\n")
    reads_path.write_text(
        "".join(f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads))

    params = ("global", 1, -1, -1, 15, 5, 0.0, True)
    proc = run_oracle(oracle_bin,
                      _oracle_args(*params, str(ref_path), str(reads_path)))
    assert proc.returncode == 0, proc.stderr
    expected = [l for l in proc.stdout.splitlines() if l]
    assert expected

    p = _bug_params(*params)
    p.fasta_match_nesting = False  # FASTQ branch does independent lookups
    got = rm.map_all(fastx.parse_fasta(str(ref_path)), reads, p)
    assert got == expected


def test_minimize_order_matches_window_walk():
    """Emit order: w-1 prefix windows, dense windows, suffix windows."""
    res = rm.minimize("TGACGTACATGGACA", k=3, w=2)
    # L=15, k=3 -> 13 k-mers; prefix: 1 window, dense: 12, suffix: 1.
    assert len(res.minimizers) == 1 + 12 + 1
    assert all(1 <= pos <= 13 for _, pos, _ in res.minimizers)
    assert all(s is True for _, _, s in res.minimizers)


def test_minimize_short_sequence():
    assert rm.minimize("ACG", k=4, w=2).minimizers == []
    assert rm.minimize("ACG", k=3, w=0).minimizers == []
    # L == k: single k-mer, w=3 -> prefix windows clamp to the one k-mer.
    res = rm.minimize("ACG", k=3, w=3)
    h = rm.kmer_hash("ACG", 0, 3)
    assert all(m == (h, 1, True) for m in res.minimizers)


def test_encoding_order():
    # C < A < T < G: "CC" < "CA" < ... and hash is the lexicographic rank.
    assert rm.kmer_hash("CC", 0, 2) == 0
    assert rm.kmer_hash("CA", 0, 2) == 1
    assert rm.kmer_hash("GG", 0, 2) == 15
    assert rm.kmer_hash("AT", 0, 2) == 0b0110
    # Unknown characters encode as 0 like unordered_map::operator[].
    assert rm.kmer_hash("NN", 0, 2) == 0


def test_lis_unsigned_wrap_semantics():
    # f must strictly increase: a smaller f wraps and fails the 5000 cap.
    chain = rm.find_lis([(10, 5), (5, 8)])
    assert chain == [(10, 5)]  # second can't chain after first
    chain = rm.find_lis([(5, 5), (10, 8)])
    assert chain == [(5, 5), (10, 8)]
    # Gap cap on reference axis.
    chain = rm.find_lis([(5, 5), (10, 6000)])
    assert len(chain) == 1
