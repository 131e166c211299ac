"""Native C++ FASTA/FASTQ parser vs the Python executable spec."""

import gzip
import random

import pytest

from bioinfo1_tpu.io import fastx, native_io


def _have_native():
    from bioinfo1_tpu import native
    return native.get_lib() is not None


pytestmark = pytest.mark.skipif(not _have_native(),
                                reason="native library unavailable")


def _random_fasta(tmp_path, seed, crlf=False, wrap=13):
    rng = random.Random(seed)
    lines = []
    records = []
    for i in range(rng.randrange(1, 8)):
        name = f"seq{i} extra descr {i}"
        seq = "".join(rng.choice("ACGTN") for _ in range(rng.randrange(0, 200)))
        records.append((f"seq{i}", seq))
        lines.append(">" + name)
        for j in range(0, len(seq), wrap):
            lines.append(seq[j:j + wrap])
    eol = "\r\n" if crlf else "\n"
    path = tmp_path / f"t{seed}.fasta"
    path.write_text(eol.join(lines) + eol)
    return str(path), records


def _random_fastq(tmp_path, seed):
    rng = random.Random(seed)
    lines = []
    records = []
    for i in range(rng.randrange(1, 8)):
        seq = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, 120)))
        records.append((f"read{i}", seq))
        lines.append(f"@read{i} comment")
        # multi-line sequence + multi-line quality
        half = len(seq) // 2
        lines.append(seq[:half])
        if seq[half:]:
            lines.append(seq[half:])
        lines.append("+")
        lines.append("I" * half)
        if len(seq) - half:
            lines.append("I" * (len(seq) - half))
    path = tmp_path / f"t{seed}.fastq"
    path.write_text("\n".join(lines) + "\n")
    return str(path), records


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("crlf", [False, True])
def test_fasta_native_matches_python(tmp_path, seed, crlf):
    path, want = _random_fasta(tmp_path, seed, crlf=crlf)
    assert fastx.parse_fasta(path) == want
    kind, got = native_io.parse(path, 1)
    assert kind == 1 and got == want


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_fastq_native_matches_python(tmp_path, seed):
    path, want = _random_fastq(tmp_path, seed)
    assert fastx.parse_fastq(path) == want
    kind, got = native_io.parse(path, 2)
    assert kind == 2 and got == want


def test_sniffing_and_gzip(tmp_path):
    path, want = _random_fastq(tmp_path, 7)
    gz = str(tmp_path / "reads.fastq.gz")
    with gzip.open(gz, "wb") as fh:
        fh.write(open(path, "rb").read())
    kind, got = native_io.parse(gz, 0)
    assert kind == 2 and got == want
    fpath, fwant = _random_fasta(tmp_path, 8)
    kind, got = native_io.parse(fpath, 0)
    assert kind == 1 and got == fwant


def test_bad_file_kinds(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("garbage\nnot a fastx\n")
    assert native_io.parse(str(bad), 0)[0] == 0
    assert native_io.parse(str(bad), 1)[0] == 0
    assert native_io.parse(str(tmp_path / "missing.fa"), 0)[0] == 0


def test_parse_slice_matches_full(tmp_path):
    """Record-slice parsing (multi-host read sharding): slices concatenate
    to the full parse, the count-only pass holds no bytes, and the
    fastx.parse_reads_slice wrapper agrees (native or fallback)."""
    path, want = _random_fastq(tmp_path, 9)
    res = native_io.parse_slice(path, 0, 0, 0)
    if res is not None:                       # count-only native pass
        kind, records, total = res
        assert (kind, records, total) == (2, [], len(want))
        k2, mid, t2 = native_io.parse_slice(path, 0, 2, 5)
        assert (k2, t2) == (2, len(want))
        assert mid == want[2:5]
    sr, total = fastx.parse_reads_slice(path, 1, 4)
    assert total == len(want)
    assert sr.is_fastq and sr.records == want[1:4]
    # Slices tile the file exactly.
    parts = []
    for lo in range(0, total, 3):
        s, _ = fastx.parse_reads_slice(path, lo, min(lo + 3, total))
        parts.extend(s.records)
    assert parts == want


def test_stream_reads_native_matches_python(tmp_path):
    path, want = _random_fastq(tmp_path, 11)
    s = fastx.stream_reads_native(path, batch_records=3)
    got = [r for b in s.batches for r in b]
    assert s.is_fastq and got == want
    ps = fastx.stream_reads(path)
    pgot = [r for b in ps.batches for r in b]
    assert got == pgot


def test_native_cigar_rle_matches_python_spec():
    """native/cigar.cpp == utils.cigar.cigar_from_codes across modes, SAM
    convention, and the local target_begin bug-compat flag (randomized op
    streams incl. empty tracebacks and semiGlobal corner pads)."""
    import numpy as np
    import jax.numpy as jnp
    from bioinfo1_tpu import native
    from bioinfo1_tpu.ops import trace as tr
    from bioinfo1_tpu.utils import cigar as cg

    if native.get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    S, B = 259, 40
    codes = np.full((S, B), 255, np.uint8)
    meta = []
    for b in range(B):
        n_ops = int(rng.integers(0, 200))
        ops = rng.choice([0, 1, 2], n_ops, p=[0.8, 0.1, 0.1]).astype(np.uint8)
        codes[:n_ops, b] = ops
        meta.append((int((ops != 1).sum()), int((ops != 2).sum())))
    packed = np.asarray(tr.pack_codes(jnp.asarray(codes)))

    for mode in ("global", "local", "semiGlobal"):
        for sam in (False, True):
            for ltbe in (False, True) if mode == "local" else (False,):
                gi = np.array([m[0] for m in meta], np.int32)
                gj = np.array([m[1] for m in meta], np.int32)
                if mode == "semiGlobal":
                    ql = np.where(np.arange(B) % 2 == 0, gi, gi + 7)
                    tl = np.where(np.arange(B) % 2 == 0, gj + 5, gj)
                else:
                    ql, tl = gi + 3, gj + 4
                nat = native.cigar_rle_batch(
                    packed, np.arange(B, dtype=np.int32), gi, gj, ql, tl,
                    mode, sam, ltbe)
                un = tr.unpack_codes_np(packed)
                for b in range(B):
                    want_c, want_tb = cg.cigar_from_codes(
                        un[:, b], mode, int(gi[b]), int(gj[b]),
                        int(ql[b]), int(tl[b]), sam_convention=sam,
                        local_target_begin_end=ltbe)
                    assert nat[0][b] == want_c, (mode, sam, ltbe, b)
                    assert nat[1][b] == (want_tb or 0), (mode, sam, ltbe, b)
