"""Command-line driver with the reference's exact surface.

Mirrors main() (team_mapper.cpp:328-397): same flags, same defaults, same
help/version text, same exit codes - so parity harnesses can diff outputs
against the compiled reference binary directly.

Extensions (not in the reference; all opt-in, prefixed ``--``):
  --sam-cigar      emit SAM-convention CIGARs instead of the reference's
                   swapped I/D convention (team_alignment.cpp:128-137)
  --bug-compat     replicate the reference's bugs exactly (SURVEY.md 2.3 #11)
  --save-index P / --load-index P   persist / reuse the packed index
  -o FILE          write PAF rows to FILE instead of stdout
  --resume         with -o: continue an interrupted run - skips the reads
                   already recorded in FILE.progress and appends (the
                   reference always restarts from scratch)
  --batch-size N   reads per device batch
  --devices N      cap the data-parallel device mesh at N local devices
                   (default: all local devices; 1 disables sharding)
  --profile        print stage wall-clock totals and throughput counters to
                   stderr at exit (the reference has no observability)

Multi-host: set JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES/JAX_PROCESS_ID)
and launch one process per host - reads are sharded per process, each
process maps its contiguous slice over its local device mesh, and the PAF
stream is gathered to process 0 in input order (the deterministic
replacement for the reference's `omp critical` merge, team_mapper.cpp:685).
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

from bioinfo1_tpu.io import fastx
from bioinfo1_tpu.utils import stats as st

VERSION = "3.1.0"
PROGRAM_NAME = "toolForGenomeAllignment"

HELP_TEXT = (
    "\n"
    f"Usage: {PROGRAM_NAME}[options] <file1> <file2>\n"
    "NOTE: file1 needs to be in FASTA format, while the second file will "
    "contain a set of fragments in either FASTA or FASTQ format.\n"
    "Options: \n"
    "\t  -a, --alignment TYPE     Alignment type: global, local, semiGlobal\n"
    "\t  -m MATCH                 Match score (default: 1)\n"
    "\t  -n MISMATCH              Mismatch penalty (default: -1)\n"
    "\t  -g GAP                   Gap penalty (default: -1)\n"
    "\t  -k KMER                  k-mer length for minimizers (default: 15)\n"
    "\t  -w WINDOW                window size for minimizers (default: 5)\n"
    "\t  -f FREQUENCY_THRESHOLD   Frequency threshold factor (default: 0.001)\n"
    "\t  -c                       Output CIGAR string\n"
    "\t  -h, --help               Show this help message\n"
    "\t  --version                Show version information\n"
    "\t  -s                       Basic statistic for first and second file\n"
)


def _json_dumps(d: dict) -> str:
    import json
    return json.dumps(d)


def _write_progress(path: str, completed: int, total, part_bytes) -> None:
    """Atomic checkpoint write: completed read count plus the output file's
    byte offset at that point (the resume path truncates to it)."""
    import json as _json
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        _json.dump({"completed_reads": completed, "total_reads": total,
                    "part_bytes": part_bytes}, fh)
    os.replace(tmp, path)


def _peer_failure_exit(err, e) -> "NoReturn":
    """Fatal multi-host peer failure: report and exit WITHOUT running
    Python atexit hooks - jax.distributed's shutdown barrier would block
    against the dead peer for its own timeout and then abort the process
    with an opaque fatal, hiding the actionable message."""
    print(str(e), file=err)
    try:
        err.flush()
        sys.stdout.flush()
    except Exception:
        pass
    os._exit(1)


def _resume_state(progress_path: str, part_path: str):
    """(start_at, "a") for --resume.  Output lines are flushed BEFORE the
    progress file updates, so a crash in that window leaves lines beyond
    completed_reads in the output file; appending blindly would duplicate
    those reads' rows (or keep a torn partial line).  Truncate the file to
    the byte offset the progress file recorded (ADVICE r03).  Progress files
    from older runs without the offset fall back to append-as-is."""
    import json as _json
    with open(progress_path) as fh:
        d = _json.load(fh)
    start_at = int(d.get("completed_reads", 0))
    pb = d.get("part_bytes")
    if pb is not None:
        with open(part_path, "r+") as fh:
            fh.truncate(int(pb))
    return start_at, "a"


def _atof(s: str) -> float:
    """std::atof semantics: parse the longest leading float, 0.0 on failure
    (the reference parses -f with atof at team_mapper.cpp:374)."""
    import re
    m = re.match(
        r"\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?"
        r"|\s*[+-]?(inf(inity)?|nan)", s, re.IGNORECASE)
    if not m:
        return 0.0
    try:
        return float(m.group(0))
    except ValueError:
        return 0.0


def _atoi(s: str) -> int:
    """std::atoi semantics: parse leading integer, 0 on failure."""
    s = s.strip()
    i, n = 0, len(s)
    if i < n and s[i] in "+-":
        i += 1
    j = i
    while j < n and s[j].isdigit():
        j += 1
    if j == i:
        return 0
    return int(s[:j])


def main(argv: Optional[List[str]] = None,
         stdout=None, stderr=None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    out = stdout if stdout is not None else sys.stdout
    err = stderr if stderr is not None else sys.stderr

    # Backend pinning (BIOINFO1_PLATFORM) + persistent compile cache.
    from bioinfo1_tpu.utils.runtime import configure_jax
    configure_jax()
    # Multi-host init must precede first backend use.
    from bioinfo1_tpu.parallel import shard as ps
    ps.distributed_initialize_if_needed()

    from bioinfo1_tpu.pipeline.mapper import Mapper, MapperConfig

    cfg = MapperConfig()
    file1 = file2 = ""
    statistic = False
    save_index = load_index = None
    out_path = None
    resume = False
    profile = False

    if not argv:
        print("Error: Not enough arguments", file=err)
        print(HELP_TEXT, end="", file=out)
        return 1
    if argv[0] in ("-h", "--help"):
        print(HELP_TEXT, end="", file=out)
        return 0
    if argv[0] == "--version":
        print(f"{PROGRAM_NAME} v{VERSION}", file=out)
        return 0
    if len(argv) < 2:
        print("Error: Expected two input files", file=err)
        return 1

    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-a", "--alignment") and i + 1 < len(argv):
            i += 1
            if argv[i] in ("global", "local", "semiGlobal"):
                cfg.align_type = argv[i]
            else:
                print("Error: Expected Alignment type: global, local, "
                      "semiGlobal", file=err)
                print(HELP_TEXT, end="", file=out)
                return 1
        elif a == "-m" and i + 1 < len(argv):
            i += 1; cfg.match = _atoi(argv[i])
        elif a == "-n" and i + 1 < len(argv):
            i += 1; cfg.mismatch = _atoi(argv[i])
        elif a == "-g" and i + 1 < len(argv):
            i += 1; cfg.gap = _atoi(argv[i])
        elif a == "-k" and i + 1 < len(argv):
            i += 1; cfg.k = _atoi(argv[i])
        elif a == "-w" and i + 1 < len(argv):
            i += 1; cfg.w = _atoi(argv[i])
        elif a == "-f" and i + 1 < len(argv):
            i += 1; cfg.f = _atof(argv[i])
        elif a == "-c":
            cfg.output_cigar = True
        elif a == "-s":
            statistic = True
        elif a == "--sam-cigar":
            cfg.sam_cigar = True
        elif a == "--bug-compat":
            cfg.banned_rev_from_fwd = True
            cfg.fasta_match_nesting = True
            cfg.local_target_begin_end = True
            cfg.threshold_from_rev_unique = True
            cfg.exact_ties = True
            cfg.oob_end_windows = True
        elif a == "--save-index" and i + 1 < len(argv):
            i += 1; save_index = argv[i]
        elif a == "--load-index" and i + 1 < len(argv):
            i += 1; load_index = argv[i]
        elif a == "-o" and i + 1 < len(argv):
            i += 1; out_path = argv[i]
        elif a == "--resume":
            resume = True
        elif a == "--profile":
            profile = True
        elif a == "--batch-size" and i + 1 < len(argv):
            i += 1; cfg.batch_size = max(1, _atoi(argv[i]))
        elif a == "--devices" and i + 1 < len(argv):
            i += 1; cfg.devices = max(0, _atoi(argv[i]))
        elif not file1:
            file1 = a
        elif not file2:
            file2 = a
        else:
            print(f"Unknown or extra argument: {a}", file=err)
            print(HELP_TEXT, end="", file=out)
            return 1
        i += 1

    if not file1 or not file2:
        print("Error: Two input files are required.", file=err)
        print(HELP_TEXT, end="", file=out)
        return 1

    # Multi-host: only process 0 speaks on stdout (stats + merged PAF).
    import jax as _jax
    if _jax.process_count() > 1 and _jax.process_index() != 0:
        out = open(os.devnull, "w")

    try:
        reference_records = fastx.parse_fasta_any(file1)
    except (OSError, fastx.FormatError) as e:
        # The reference aborts via an uncaught bioparser exception here; we
        # fail with a clean message instead.
        print(f"Error: cannot read reference FASTA: {e}", file=err)
        return 1
    if not reference_records:
        print(f"Error: reference FASTA is empty: {file1}", file=err)
        return 1
    if statistic:
        print("Basic statistic for reference genome", file=out)
        print("------------------------------------", file=out)
        print(fastx.basic_statistics(reference_records, "fasta"), file=out)

    from bioinfo1_tpu.utils.tracing import StageTimers, Counters
    timers = StageTimers()
    counters = Counters()
    with timers.stage("index_build"):
        mapper = Mapper(reference_records, cfg, load_index=load_index)
    if save_index:
        from bioinfo1_tpu.index.builder import save_index as do_save
        do_save(mapper.index, save_index)

    if statistic:
        idx = mapper.index
        print(st.index_statistics(
            (idx.fwd.n_distinct_hashes, idx.fwd.n_singleton_hashes,
             idx.fwd.top_surviving),
            (idx.rev.n_distinct_hashes, idx.rev.n_singleton_hashes,
             idx.rev.top_surviving),
            cfg.k), file=out)

    import jax
    nproc = jax.process_count()
    # Liveness-aware merge channel, opened BEFORE mapping: a peer that dies
    # mid-run fails the whole job in seconds (naming the resumable part
    # files) instead of stalling the merge for its multi-hour timeout.
    merge_sess = (ps.MergeSession(part_hint=out_path or "")
                  if nproc > 1 else None)

    # Constant-memory streaming (the reference's 1 GB FASTQ chunk loop,
    # team_mapper.cpp:534-545): engaged for file output without -s stats
    # (which needs every record up front) in single-process runs.
    stream_mode = (out_path is not None and not statistic and nproc == 1)
    reads = None
    total_reads = None
    if stream_mode:
        try:
            # Single-pass chunked Python stream: O(file) time, O(chunk)
            # memory.  (The native slice-based stream re-parses the whole
            # file per batch - right shape for the multi-host count+slice
            # pattern, wrong one for whole-file streaming.)
            stream = fastx.stream_reads(file2)
        except (OSError, fastx.FormatError):
            print("Given file is not in FASTA or FASTQ format! ", file=err)
            return 1
        is_fastq = stream.is_fastq
    elif nproc > 1 and not statistic:
        # Sharded parse (SURVEY.md 2.2): a count-only native pass sizes the
        # slices, then each process materializes ONLY its contiguous record
        # slice - per-host memory ~1/nproc of the reads file instead of all
        # of it (r02 parsed the whole file on every process).
        try:
            _, total_reads = fastx.parse_reads_slice(file2, 0, 0)
            lo, hi = ps.process_read_slice(total_reads)
            reads, _ = fastx.parse_reads_slice(file2, lo, hi)
        except (OSError, fastx.FormatError):
            print("Given file is not in FASTA or FASTQ format! ", file=err)
            return 1
        is_fastq = reads.is_fastq
    else:
        try:
            reads = fastx.parse_reads(file2)
        except fastx.FormatError:
            print("Given file is not in FASTA or FASTQ format! ", file=err)
            return 1
        is_fastq = reads.is_fastq
    # The FASTA-branch match-nesting bug only applies when the reads file is
    # FASTA (team_mapper.cpp:629-638); FASTQ always does independent lookups.
    if cfg.fasta_match_nesting and is_fastq:
        cfg.fasta_match_nesting = False

    if statistic:
        print(file=out)
        print("Basic statistic for fragments of genome", file=out)
        print("------------------------------------", file=out)
        kind = "fastq" if is_fastq else "fasta"
        print(fastx.basic_statistics(reads.records, kind), file=out)

    # Per-read stats only exist in the reference's FASTA branch
    # (team_mapper.cpp:610-624); the FASTQ loop has none.
    per_read_stats = statistic and not is_fastq

    # Multi-host: each process maps its contiguous read slice; the PAF
    # stream is gathered point-to-point to process 0 (deterministic input
    # order).  With -o, every process checkpoints its slice to a part file
    # (FILE.part<p> + FILE.progress.p<p>), so --resume works per process -
    # the merge re-runs from the completed parts after a crash.
    if nproc > 1:
        import json as _json
        pid = jax.process_index()
        if total_reads is not None:
            local_records = reads.records         # already this one's slice
        else:
            lo, hi = ps.process_read_slice(len(reads.records))
            local_records = reads.records[lo:hi]

        def finish():
            if profile:
                print(timers.report(), file=err)
                print(_json_dumps(mapper.counters.as_dict()), file=err)
            return 0

        if out_path is not None:
            part_path = f"{out_path}.part{pid}"
            progress_path = f"{out_path}.progress.p{pid}"
            start_at = 0
            fmode = "w"
            if (resume and os.path.exists(progress_path)
                    and os.path.exists(part_path)):
                start_at, fmode = _resume_state(progress_path, part_path)
            try:
                with timers.stage("map"), open(part_path, fmode) as pf:
                    for done, lines in mapper.map_records_iter(
                            local_records, per_read_stats=per_read_stats,
                            start_at=start_at):
                        for line in lines:
                            print(line, file=pf)
                        pf.flush()
                        _write_progress(progress_path, done,
                                        len(local_records), pf.tell())
                        # Abort (resumably) within seconds of a peer dying
                        # rather than mapping to completion first.
                        merge_sess.check()
            except RuntimeError as e:
                _peer_failure_exit(err, e)
            with open(part_path) as pf:
                local_lines = pf.read().splitlines()
            try:
                with timers.stage("merge"):
                    merged = merge_sess.gather(local_lines)
            except RuntimeError as e:
                _peer_failure_exit(err, e)
            if merged is not None:
                with open(out_path, "w") as sink:
                    for line in merged:
                        print(line, file=sink)
            return finish()

        with timers.stage("map"):
            local_lines = mapper.map_records(local_records,
                                             per_read_stats=per_read_stats)
        try:
            with timers.stage("merge"):
                merged = merge_sess.gather(local_lines)
        except RuntimeError as e:
            _peer_failure_exit(err, e)
        if merged is not None:
            for line in merged:
                print(line, file=out)
        return finish()

    counters.start()
    if out_path is None:
        with timers.stage("map"):
            lines = mapper.map_records(reads.records,
                                       per_read_stats=per_read_stats)
        for line in lines:
            print(line, file=out)
        counters.observe(len(reads.records),
                         sum(len(s) for _, s in reads.records),
                         mapper.counters.dp_cells,
                         sum(1 for l in lines if "\t" in l))
        if profile:
            print(timers.report(), file=err)
            print(counters.json_line(), file=err)
            print(_json_dumps(mapper.counters.as_dict()), file=err)
        return 0

    # Checkpointed file output: FILE.progress records the number of fully
    # processed reads; --resume appends from there after a crash/restart.
    import json as _json
    progress_path = out_path + ".progress"
    start_at = 0
    file_mode = "w"
    if resume and os.path.exists(progress_path) and os.path.exists(out_path):
        start_at, file_mode = _resume_state(progress_path, out_path)

    if stream_mode:
        # Constant memory: record batches stream off disk, map, append,
        # checkpoint (total_reads unknown until the stream ends).
        done = 0
        with timers.stage("map"), open(out_path, file_mode) as paf_out:
            for batch in stream.batches:
                lo = max(0, start_at - done)
                if lo >= len(batch):
                    done += len(batch)
                    continue
                base = done + lo
                for nxt, lines in mapper.map_records_iter(batch[lo:]):
                    for line in lines:
                        print(line, file=paf_out)
                    paf_out.flush()
                    _write_progress(progress_path, base + nxt, None,
                                    paf_out.tell())
                done += len(batch)
            paf_out.flush()
            _write_progress(progress_path, done, done, paf_out.tell())
        if profile:
            print(timers.report(), file=err)
            print(_json_dumps(mapper.counters.as_dict()), file=err)
        return 0

    with open(out_path, file_mode) as paf_out:
        for done, lines in mapper.map_records_iter(
                reads.records, per_read_stats=per_read_stats,
                start_at=start_at):
            for line in lines:
                print(line, file=paf_out)
            paf_out.flush()
            _write_progress(progress_path, done, len(reads.records),
                            paf_out.tell())
    if profile:
        print(timers.report(), file=err)
        print(_json_dumps(mapper.counters.as_dict()), file=err)
    return 0


if __name__ == "__main__":
    sys.exit(main())
