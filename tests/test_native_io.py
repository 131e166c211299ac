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
