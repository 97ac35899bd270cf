"""Chaos certification of the bucketed target's manifest-committed-last
protocol under REAL process kills (VERDICT r9 stretch #8: the existing
crash tests inject exceptions — an actual SIGKILL of the applying process
mid-write is the only way to certify the os.replace commit point against
a dead JVM, not a Python-level unwind).

Harness: a child process (own Python + own Spark JVM, launched in its own
process group) applies CDC batches to a shared on-disk
BucketedParquetKeyValueTarget, journaling "start i" / "committed i" lines
(fsync'd) around each apply. The parent SIGKILLs the ENTIRE process group
at a random point after observing a fresh "start" line — landing the kill
anywhere in read_for/apply/parquet-write/manifest-replace — then verifies,
with its own session, the recovery invariants:

- the manifest always parses (os.replace can never leave a torn file);
- the recovered state equals the dict oracle after EXACTLY k whole
  batches for some k — never a torn mix of two batches (each batch stamps
  a sentinel entity with its index, so k is recoverable from state);
- k never regresses across kill cycles (committed work is durable);
- journal consistency: k is at least the last journaled "committed" line
  (a commit acknowledged to the journal can never be lost);
- unreferenced half-written version dirs are gc-safe: gc() removes only
  dirs no manifest entry references, and a post-gc read is unchanged.

After the kill cycles, a final un-killed child drains the remaining
batches and the end state must equal the full oracle.
"""

from __future__ import annotations

import json
import os
import random
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_BATCHES = 60
BATCH_SIZE = 3
N_KILL_CYCLES = 20
SENTINEL = 999

_CHILD = """
import os, sys, json
sys.path.insert(0, {repo!r})

tgt, log_path, records_path, start_batch = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
)
batch_size = {batch_size}

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from wal_consumer_spark.operators.cdc import apply_cdc_batch
from wal_consumer_spark.streaming import BucketedParquetKeyValueTarget

records = json.load(open(records_path))
target = BucketedParquetKeyValueTarget(spark, tgt, n_buckets=8)
log = open(log_path, "a")

def journal(line):
    log.write(line + chr(10))
    log.flush()
    os.fsync(log.fileno())

n_batches = len(records) // batch_size
for i in range(start_batch, n_batches):
    rows = [
        (j, k, op, v.encode() if v is not None else None, "TestEntity")
        for j, (k, op, v) in enumerate(
            records[i * batch_size : (i + 1) * batch_size],
            start=i * batch_size,
        )
    ]
    batch = spark.createDataFrame(
        rows,
        "id LONG, entity_id LONG, operation STRING, "
        "entity_bytes BINARY, entity_type STRING",
    )
    journal("start " + str(i))
    touched = target.touched_buckets(batch)
    state = target.read_for(batch, touched)
    new_state = apply_cdc_batch(state, batch)
    target.write_for(new_state, batch, touched)
    journal("committed " + str(i))

spark.stop()
"""


def _make_records() -> list[tuple[int, str, str | None]]:
    """N_BATCHES batches of BATCH_SIZE ops; every batch's LAST op updates
    the sentinel entity with the batch index, so the committed-batch count
    is recoverable from state alone."""
    records: list[tuple[int, str, str | None]] = []
    for b in range(N_BATCHES):
        for s in range(BATCH_SIZE - 1):
            step = b * (BATCH_SIZE - 1) + s
            e = (step * 5) % 12 + 1
            if step % 7 == 3:
                records.append((e, "DELETE", None))
            elif step % 11 == 0:
                records.append((e, "ADD", f"v{step}"))
            else:
                records.append((e, "UPDATE", f"v{step}"))
        records.append((SENTINEL, "UPDATE", f"b{b}"))
    return records


def _oracle_prefixes(records) -> list[dict[int, str]]:
    """prefixes[k] = dict state after the first k whole batches."""
    prefixes = [{}]
    state: dict[int, str] = {}
    for b in range(N_BATCHES):
        for e, op, v in records[b * BATCH_SIZE : (b + 1) * BATCH_SIZE]:
            if op == "DELETE":
                state.pop(e, None)
            else:
                state[e] = v
        prefixes.append(dict(state))
    return prefixes


def _recovered_state(spark, tgt) -> dict[int, str]:
    from wal_consumer_spark.streaming import BucketedParquetKeyValueTarget

    target = BucketedParquetKeyValueTarget(spark, tgt, n_buckets=8)
    return {
        r.entity_id: bytes(r.entity_bytes).decode()
        for r in target.read().collect()
    }


def _committed_batches(state: dict[int, str]) -> int:
    if SENTINEL not in state:
        return 0
    return int(state[SENTINEL][1:]) + 1


def test_sigkill_mid_apply_manifest_last_soak(spark, tmp_path):
    records = _make_records()
    prefixes = _oracle_prefixes(records)
    tgt = str(tmp_path / "tgt")
    log_path = str(tmp_path / "journal.log")
    records_path = str(tmp_path / "records.json")
    child_path = str(tmp_path / "child.py")
    with open(records_path, "w") as f:
        json.dump(records, f)
    with open(child_path, "w") as f:
        f.write(_CHILD.format(repo=REPO, batch_size=BATCH_SIZE))

    rng = random.Random(0xC4A05)
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)  # fresh JVM, never the parent's
    env.pop("PYSPARK_GATEWAY_SECRET", None)

    def spawn(start_batch: int) -> subprocess.Popen:
        return subprocess.Popen(
            [sys.executable, child_path, tgt, log_path, records_path,
             str(start_batch)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            start_new_session=True,  # own process group: killpg takes the JVM too
            env=env,
        )

    def journal_lines() -> list[str]:
        try:
            with open(log_path) as f:
                return [ln.strip() for ln in f if ln.strip()]
        except FileNotFoundError:
            return []

    k = 0
    kills = 0
    max_jvm_wait = 120.0
    while kills < N_KILL_CYCLES and k < N_BATCHES:
        seen = len(journal_lines())
        proc = spawn(k)
        # wait for the child to journal a fresh "start" (JVM up, batch
        # in flight), then kill the whole group at a random offset inside
        # the apply
        deadline = time.monotonic() + max_jvm_wait
        started = False
        while time.monotonic() < deadline:
            lines = journal_lines()
            if len(lines) > seen and lines[-1].startswith("start"):
                started = True
                break
            if proc.poll() is not None:
                break  # child finished every batch before journaling more
            time.sleep(0.02)
        if started:
            time.sleep(rng.uniform(0.0, 0.9))
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
            kills += 1
        proc.wait()

        # ---- recovery invariants (parent session, files only) ----
        # 1. manifest parses — os.replace may never leave a torn file
        manifest_path = os.path.join(tgt, "_MANIFEST.json")
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = {kk: int(vv) for kk, vv in json.load(f).items()}
        else:
            manifest = {}
        # 2. state is EXACTLY some whole-batch prefix — never torn
        state = _recovered_state(spark, tgt)
        k_new = _committed_batches(state)
        assert state == prefixes[k_new], (
            f"recovered state is not a whole-batch prefix after kill "
            f"{kills}: claims {k_new} batches"
        )
        # 3. durability: committed work never regresses
        assert k_new >= k, f"commit count regressed {k} -> {k_new}"
        # 4. journal consistency: an acknowledged commit is never lost
        committed_lines = [
            int(ln.split()[1])
            for ln in journal_lines()
            if ln.startswith("committed")
        ]
        if committed_lines:
            assert k_new >= max(committed_lines) + 1
        # 5. gc() removes only unreferenced (possibly half-written)
        #    version dirs; the committed state is untouched by it
        from wal_consumer_spark.streaming import BucketedParquetKeyValueTarget

        target = BucketedParquetKeyValueTarget(spark, tgt, n_buckets=8)
        removed = target.gc()
        live = {f"v{v}" for v in manifest.values()}
        assert not {os.path.basename(p) for p in removed} & live
        assert _recovered_state(spark, tgt) == state
        k = k_new

    assert kills == N_KILL_CYCLES, f"only {kills} kill cycles ran"

    # final un-killed drain: the surviving protocol must converge to the
    # full oracle
    proc = spawn(k)
    assert proc.wait(timeout=600) == 0
    assert _recovered_state(spark, tgt) == prefixes[N_BATCHES]
