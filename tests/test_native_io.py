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
