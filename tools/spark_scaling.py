"""Spark-level scaling evidence for the north rule — the ENGINE, not just
the kernel, at two parallelism levels.

Complements tools/kernel_scaling.py (which isolates the scoring kernel in
bare processes): here the measured job is the real Spark scoring stage
(`score_pairs` — join + repartition + Arrow + mapInPandas kernel) run in
a fresh JVM at local[8] and local[32] over the SAME parquet input
(strong scaling), so the evidence covers Spark scheduling, shuffle, and
the Python worker path.

Capacity-normalized protocol, SYMMETRIC WORKLOAD: hi/lo CONCURRENT
local[lo] engines (own JVM each, barrier-synced measured passes, one
scoring job each) vs one local[hi] engine processing the SAME number of
independent scoring jobs CONCURRENTLY (driver threads). Both windows
are fully occupied and all-Spark, and both sides process an identical
4-job workload, so the comparison asks the fleet question directly: do
4N consolidated cores deliver the aggregate throughput of 4 separate
N-core engines? Handing the consolidated engine a SINGLE toy job
instead (the earlier design) taxes it with idle cores at every stage
barrier (bandwidth-bound scan/exchange phases, kernel straggler tails
— measured 30% straggler loss at 32 tasks vs 8% at 8) that a real
shared cluster never pays, because real clusters multiplex jobs;
job-level concurrency is precisely what lets the scheduler fill those
slots. (The even earlier burner design — local[lo] + unmetered
arithmetic burners — is NOT occupancy-equivalent for a JVM+workers
job: a local[8] engine runs far more than 8 runnable threads and
out-schedules pure-compute burners erratically; measured lo windows
swung 12-29 s on the same config.)

Each rep carries a low-duty THREE-axis pulse probe: an arithmetic burst
(frequency/scheduling dilation), a page-fault burst (mmap/fault-path
latency — on this sandbox VM concurrent first-touch faults serialize
box-wide, invisible to arithmetic), and a streaming-bandwidth burst
(32 MB sum — DRAM contention dilates the cache-missing kernel while
both other axes read calm). A rep counts only if the windows agree
within 20% (arith), 2x (fault), and 1.5x (bandwidth); discards are
reported.

Two launch-side defenses against this sandbox's co-tenant waves
(post-hoc discarding alone burned all attempts on a loaded evening):
a QUIET GATE — before each rep, an inline solo canary (same three
bursts, run while nothing of ours is active) must read within 1.25x of
its running floor (min ever observed) OR hold a steady plateau across
three consecutive canaries (per-axis tolerances) — transient waves are
what must not straddle a rep's two windows; STEADY background load is
fair to both and is policed by the in-window rules. Wait is bounded by
SASSY_SCALING_MAX_QUIET_WAIT (default 120 s, further shrunk near the
budget deadline; on timeout the rep launches anyway, disclosed) — and
SANDWICH REPS (round-5, replacing order alternation): each rep runs
lo,hi,lo — the consolidated window bracketed by two identical fleet
windows and normalized against their MEAN, cancelling linear drift
WITHIN the rep (alternation only cancelled it across reps; an idle-box
round-5 run still spread 0.415..1.084 because individual ~60s windows
caught waves the pulse probes read as clean — identical lo work swung
22.8..65.1s wall). The brackets double as the most sensitive
contamination probe available (they ARE the measured workload): reps
whose two brackets disagree >25% in rate are discarded as in-rep waves.

HARD WALL-CLOCK BUDGET (round-4 VERDICT "What's wrong" #2): the round-4
protocol spun up 5 fresh JVMs PER REP (~71 min for one run) and a 900 s
`subprocess.run` timeout inside a rep propagated uncaught into bench.py,
destroying the whole round's bench record. Two structural fixes:

* PERSISTENT ENGINES — all hi/lo children start ONCE per protocol run,
  warm to steady state, then serve every rep through a file-barrier
  loop (go_N / stop files). JVM startup + warmup is paid once, so a
  rep costs only its two measured windows (+ quiet gate).
* BUDGET — `SASSY_SCALING_BUDGET_SEC` (default 900) is a deadline for
  the WHOLE protocol. Quiet-gate waits shrink as the deadline nears, a
  new rep only launches if the remaining budget covers ~1.2x the last
  rep's cost, and every child wait is deadline-bounded; on expiry the
  protocol returns whatever clean reps it has, marked
  ``truncated: true`` — it never raises.

Usage:
    python tools/spark_scaling.py [n_pairs] [--repeats 3] [--lo 8 --hi 32]
Child mode (internal): --child --cores N --input DIR [--sync FILE]
                       [--jobs M] [--persist]
                       (M concurrent scoring jobs in window; --persist
                       keeps the engine alive across reps)
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")

RESULT_MARKER = "SPARK_SCALING_RESULT "


# ------------------------------------------------------------------ child


READY_MARKER = "SPARK_SCALING_READY"


def child_main(
    cores: int,
    input_dir: str,
    sync_file: str | None = None,
    jobs: int = 1,
    persist: bool = False,
) -> None:
    """One engine. ``jobs`` > 1 submits that many INDEPENDENT scoring jobs
    concurrently (driver threads) in the measured window — the consolidated
    hi engine gets the same 4-job workload the 4-engine lo fleet processes,
    so the comparison is symmetric: a shared big cluster is never handed a
    single toy job at a time, and job-level concurrency lets the scheduler
    fill the cores one job's barrier phases (scan/shuffle, straggler tails)
    leave idle — exactly the consolidation benefit a real deployment gets."""
    from pyspark.sql import functions as F

    from sassy_spark.session import build_spark

    spark = build_spark(app_name=f"spark_scaling_{cores}", cores=cores)
    pages = spark.read.parquet(f"{input_dir}/pages").persist()
    pairs = spark.read.parquet(f"{input_dir}/pairs").persist()
    pages.count()
    pairs.count()

    from sassy_spark.operators.linkage import score_pairs

    # Fair-share partitioning for concurrent jobs: each of the M jobs
    # fans its kernel stage to cores/M partitions, so the engine runs
    # exactly `cores` concurrent kernel tasks — the same task granularity
    # as the M-engine fleet it is compared against. Letting every job
    # default to ALL cores (M x cores tiny tasks) measured 1.45x the
    # core-seconds for identical work at equal box occupancy: each extra
    # task wave re-pays Python worker handoff + fresh Arrow buffer
    # first-touch faults, which serialize box-wide on this VM. A real
    # multi-tenant deployment configures exactly this (FAIR pools with
    # per-pool shares / data-sized partitions), so the consolidated
    # engine is entitled to it.
    share = max(1, cores // max(1, jobs))

    def one_pass(frame=None) -> int:
        scored = score_pairs(
            frame if frame is not None else pairs,
            pages,
            k_frac=0.05,
            score_partitions=share,
        )
        # sum(cost) forces the kernel output itself (a bare count could
        # survive column pruning upstream of a weaker operator)
        row = scored.agg(
            F.count("*").alias("n"), F.sum("cost").alias("s")
        ).collect()[0]
        return int(row["n"])

    def measured_pass(frame=None) -> int:
        if jobs == 1:
            return one_pass(frame)
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=jobs) as ex:
            return sum(ex.map(lambda _: one_pass(frame), range(jobs)))

    # warmup to STEADY STATE, not one pass, in the SAME shape as the
    # measured window (jobs concurrent passes): per-Python-worker warmup
    # (numpy/Arrow buffer faulting, JIT) scales with pairs-per-worker, so
    # a single serial pass leaves a local[32] engine's 32 workers 4x less
    # warmed than a local[8] engine's 8 (measured: identical passes ran
    # 65s -> 33s -> 27s in one session) — biasing the efficiency ratio
    # against the consolidated engine.
    #
    # BUDGETED (round-5: spin-up at 98k pairs ran ~430s/engine and blew
    # every protocol budget — zero reps landed): pass 1 warms on a 1/4
    # SLICE (per-worker numpy/Arrow/JIT warmup needs rows through every
    # worker, not full-input volume), then full passes until two agree
    # within 15%, capped at 3 full passes AND a wall-clock budget
    # (SASSY_SCALING_WARMUP_SEC, default 180). The cap is the same for
    # every engine; because the hi engine warms `jobs`x the volume, an
    # expiring cap truncates the CONSOLIDATED side's warmup first —
    # i.e. it biases the measured efficiency DOWN, never up.
    warmup_budget = float(os.environ.get("SASSY_SCALING_WARMUP_SEC", "180"))
    t_warm = time.time()
    warm_slice = pairs.limit(max(1024, pairs.count() // 4)).persist()
    measured_pass(warm_slice)
    warm_slice.unpersist()
    prev = None
    for _ in range(3):
        if time.time() - t_warm > warmup_budget:
            break
        t0 = time.time()
        measured_pass()
        dt = time.time() - t0
        if prev is not None and abs(dt - prev) <= 0.15 * prev:
            break
        prev = dt

    def run_measured() -> None:
        t0 = time.time()
        n = measured_pass()
        t1 = time.time()
        print(
            RESULT_MARKER
            + json.dumps({"cores": cores, "t0": t0, "t1": t1, "n_pairs": n}),
            flush=True,
        )

    if persist:
        # persistent-engine loop: warm ONCE, then serve every rep through
        # a file barrier — READY, wait for {sync}_go{gen} (or {sync}_stop),
        # run one measured pass, repeat. Sibling engines sharing a sync
        # prefix wake on the same go file, so their measured passes start
        # together (within the 50 ms poll) — the per-rep barrier.
        assert sync_file is not None
        gen = 0
        stop_path = f"{sync_file}_stop"
        while True:
            print(READY_MARKER, flush=True)
            go_path = f"{sync_file}_go{gen}"
            while not os.path.exists(go_path) and not os.path.exists(stop_path):
                time.sleep(0.05)
            if not os.path.exists(go_path):
                break
            run_measured()
            gen += 1
        spark.stop()
        return
    if sync_file is not None:
        # barrier with sibling children: all warm up, then measure together
        print(READY_MARKER, flush=True)
        while not os.path.exists(sync_file):
            time.sleep(0.05)
    run_measured()
    spark.stop()


def _child_cmd(
    cores: int,
    input_dir: str,
    sync_file: str | None = None,
    jobs: int = 1,
    persist: bool = False,
):
    cmd = [
        sys.executable,
        str(Path(__file__).resolve()),
        "--child",
        "--cores",
        str(cores),
        "--input",
        input_dir,
        "--jobs",
        str(jobs),
    ]
    if sync_file:
        cmd += ["--sync", sync_file]
    if persist:
        cmd += ["--persist"]
    return cmd


def _child_env() -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _parse_result(line: str) -> dict:
    out = json.loads(line[len(RESULT_MARKER):])
    out["wall_sec"] = round(out["t1"] - out["t0"], 3)
    out["pairs_per_sec"] = round(out["n_pairs"] / (out["t1"] - out["t0"]), 1)
    return out


class _ProtocolTimeout(Exception):
    """A deadline-bounded wait on a child expired — contamination/overrun
    evidence, handled by truncating the protocol, never propagated."""


class _Engine:
    """A persistent scoring engine: one child JVM, warmed once, serving a
    measured pass per rep through the go/stop file barrier. All stdout
    reads are DEADLINE-bounded (a reader thread feeds a queue) — nothing
    here can raise subprocess.TimeoutExpired into the caller (the exact
    failure that destroyed BENCH_r04)."""

    def __init__(
        self, cores: int, input_dir: str, jobs: int, sync_prefix: str
    ) -> None:
        import queue
        import threading

        self.cores = cores
        self.sync_prefix = sync_prefix
        self.proc = subprocess.Popen(
            _child_cmd(cores, input_dir, sync_prefix, jobs=jobs, persist=True),
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=_child_env(),
        )
        self._q: "queue.Queue[str | None]" = queue.Queue()
        self._reader = threading.Thread(target=self._pump, daemon=True)
        self._reader.start()

    def _pump(self) -> None:
        for line in iter(self.proc.stdout.readline, ""):
            self._q.put(line)
        self._q.put(None)

    def expect(self, marker: str, deadline: float) -> str:
        import queue

        while True:
            remaining = deadline - time.time()
            if remaining <= 0:
                raise _ProtocolTimeout(
                    f"engine cores={self.cores} missed {marker!r} deadline"
                )
            try:
                line = self._q.get(timeout=min(remaining, 1.0))
            except queue.Empty:
                continue
            if line is None:
                raise _ProtocolTimeout(
                    f"engine cores={self.cores} exited before {marker!r}"
                )
            if line.startswith(marker):
                return line

    def result(self, deadline: float) -> dict:
        return _parse_result(self.expect(RESULT_MARKER, deadline))

    def shutdown(self) -> None:
        try:
            Path(f"{self.sync_prefix}_stop").touch()
        except OSError:
            pass
        try:
            self.proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            self.proc.kill()
            try:
                self.proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass


# ----------------------------------------------------------------- parent


_CANARY_BURSTS = None


def _solo_canary(cycles: int = 12) -> dict:
    """Run the three probe bursts INLINE in the parent for ~0.7 s and
    return the per-axis medians (ms). Called BETWEEN reps, when nothing
    of ours is running, so the reading is exogenous load only. Inline
    (not a spawned probe process) so the sample count is deterministic —
    the spawned variant intermittently lost its whole window to process
    startup and returned None."""
    global _CANARY_BURSTS
    import statistics as st

    from tools.kernel_scaling import _make_probe_bursts

    if _CANARY_BURSTS is None:
        burst, fault_burst, bw_burst = _make_probe_bursts()
        for _ in range(20):  # one-time warmup
            burst()
        fault_burst()
        bw_burst()
        _CANARY_BURSTS = (burst, fault_burst, bw_burst)
    burst, fault_burst, bw_burst = _CANARY_BURSTS
    a, f, b = [], [], []
    for _ in range(cycles):
        t = time.time()
        burst()
        a.append(time.time() - t)
        f.append(fault_burst())
        b.append(bw_burst())
        time.sleep(0.05)
    return {
        "arith_ms": round(st.median(a) * 1000, 3),
        "fault_ms": round(st.median(f) * 1000, 3),
        "bw_ms": round(st.median(b) * 1000, 3),
    }


# plateau tolerances per axis (arith is tight, fault is inherently noisy)
_PLATEAU_TOL = {"arith_ms": 1.15, "fault_ms": 1.75, "bw_ms": 1.35}


def _quiet_gate(floor: dict, max_wait_s: float) -> tuple[dict | None, bool]:
    """Wait for a STABLE launch window; two pass conditions per canary:

    * floor fast-path — every axis within 1.25x of the global running
      floor (min ever observed): the box is as quiet as it gets. Never
      the ONLY rule: a single lucky reading (NUMA placement, frequency
      boost) would set an unreachable floor and the gate would time out
      on every rep (observed: 17 min, zero launches).
    * plateau rule — the last 3 canaries agree per-axis (arith 15%,
      fault 75%, bw 35%): conditions are STEADY. Transient co-tenant
      waves — the thing that hits exactly one of a rep's two windows —
      show as canary-to-canary swing; steady background load is fair to
      both windows and is already policed by the in-window
      probe-agreement rule.

    Launching into a wave otherwise burns one of the bounded rep
    attempts on a guaranteed discard. On timeout the rep launches anyway
    (disclosed via quiet_gate_ok=False) and remains subject to the
    in-window discard rules."""
    t_start = time.time()
    recent: list[dict] = []
    while True:
        c = _solo_canary()
        recent.append(c)
        del recent[:-3]
        for k, v in c.items():
            floor[k] = min(floor.get(k, v), v)
        if all(c[k] <= 1.25 * floor[k] for k in c):
            return c, True
        if len(recent) == 3 and all(
            max(r[k] for r in recent)
            <= _PLATEAU_TOL[k] * min(r[k] for r in recent)
            for k in c
        ):
            return c, True
        if time.time() - t_start > max_wait_s:
            return c, False
        time.sleep(10.0)


def make_input(n_pairs: int, out_dir: str, seed: int = 1234) -> None:
    """Deterministic near-duplicate pair workload (same generator as the
    kernel protocol), written as pages + pairs parquet via pyarrow — no
    JVM in the parent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.kernel_scaling import make_workload

    a_l, b_l, _k = make_workload(seed, n_pairs)
    urls_a = [f"a{i:07d}" for i in range(n_pairs)]
    urls_b = [f"b{i:07d}" for i in range(n_pairs)]
    pages = pa.table(
        {"url": urls_a + urls_b, "text": list(a_l) + list(b_l)}
    )
    pairs = pa.table({"url_a": urls_a, "url_b": urls_b})
    os.makedirs(f"{out_dir}/pages", exist_ok=True)
    os.makedirs(f"{out_dir}/pairs", exist_ok=True)
    pq.write_table(pages, f"{out_dir}/pages/part-0.parquet")
    pq.write_table(pairs, f"{out_dir}/pairs/part-0.parquet")


def run_protocol(
    n_pairs: int = 49152,
    repeats: int = 3,
    lo: int = 8,
    hi: int = 32,
    input_dir: str | None = None,
    budget_sec: float | None = None,
) -> dict:
    import tempfile

    from tools.kernel_scaling import _probe_median, _pulse_probe

    if budget_sec is None:
        budget_sec = float(os.environ.get("SASSY_SCALING_BUDGET_SEC", "900"))
    t_protocol = time.time()
    deadline = t_protocol + budget_sec
    if input_dir is None:
        input_dir = tempfile.mkdtemp(
            prefix="spark_scaling_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        make_input(n_pairs, input_dir)
    fanout = hi // lo
    ctx = mp.get_context("spawn")
    samples: list[dict] = []
    discarded: list[dict] = []
    attempts = 0
    canary_floor: dict = {}
    truncated = False
    protocol_error: str | None = None
    max_quiet_wait = float(os.environ.get("SASSY_SCALING_MAX_QUIET_WAIT", "120"))
    # persistent engines — ONE spin-up (JVM start + steady-state warmup)
    # for the whole protocol; every rep reuses them through the go-file
    # barrier. Spin-up is concurrent across engines and deadline-bounded.
    hi_eng: _Engine | None = None
    lo_engs: list[_Engine] = []
    last_rep_cost = 150.0  # sandwich: 3 windows per rep
    try:
        hi_eng = _Engine(
            hi, input_dir, jobs=fanout,
            sync_prefix=os.path.join(input_dir, "_hi"),
        )
        lo_sync = os.path.join(input_dir, "_lo")
        lo_engs = [
            _Engine(lo, input_dir, jobs=1, sync_prefix=lo_sync)
            for _ in range(fanout)
        ]
        spinup_deadline = min(deadline, time.time() + max(180, budget_sec * 0.7))
        hi_eng.expect(READY_MARKER, spinup_deadline)
        for e in lo_engs:
            e.expect(READY_MARKER, spinup_deadline)
        hi_gen = 0  # per-group go-file generation counters: the lo
        lo_gen = 0  # fleet serves TWO windows per rep (the sandwich)
        while len(samples) < repeats and attempts < repeats * 3:
            remaining = deadline - time.time()
            if remaining < max(45.0, 1.2 * last_rep_cost):
                truncated = len(samples) < repeats
                break
            t_rep = time.time()
            attempts += 1
            # quiet-gate wait shrinks as the deadline nears — never more
            # than ~25% of what's left
            gate_wait = min(max_quiet_wait, max(15.0, 0.25 * remaining))
            canary, gate_ok = _quiet_gate(canary_floor, gate_wait)
            stop_evt = ctx.Event()
            pq_ = ctx.Queue()
            probe = ctx.Process(
                target=_pulse_probe, args=(stop_evt, pq_), daemon=True
            )
            probe.start()
            # capacity-normalized comparison: `fanout` CONCURRENT local[lo]
            # engines (barrier-synced measured passes) vs one local[hi]
            # engine. Both windows are fully-occupied, all-Spark — this is
            # the fleet question stated directly: do 4N consolidated cores
            # deliver what 4 separate N-core engines deliver? While one
            # side's window runs, the other side's engines idle at the
            # go-file poll (50 ms sleep loop + idle JVM) — negligible, and
            # policed by the in-window probe rules regardless.
            #
            # SANDWICH design (round-5): lo -> hi -> lo. The consolidated
            # window is BRACKETED by two fleet windows and normalized
            # against their MEAN, cancelling linear co-tenant drift across
            # the rep (order alternation, the previous defense, only
            # cancels drift ACROSS reps — a round-5 idle-box run still
            # spread 0.415..1.084 because individual ~60s windows caught
            # waves the microsecond pulse probes read as clean: identical
            # lo work swung 22.8..65.1s wall). The brackets also become
            # the most sensitive contamination probe available — they ARE
            # the measured workload — via the bracket-agreement discard
            # rule below.
            window_deadline = deadline + 30.0  # grace so a rep mid-flight
            # at budget expiry can still land; a wedged child trips this
            # and truncates the protocol instead of raising
            try:
                Path(f"{lo_sync}_go{lo_gen}").touch()
                los1 = [e.result(window_deadline) for e in lo_engs]
                lo_gen += 1
                for e in lo_engs:  # re-arm for the closing bracket
                    e.expect(READY_MARKER, window_deadline)
                Path(f"{hi_eng.sync_prefix}_go{hi_gen}").touch()
                r_hi = hi_eng.result(window_deadline)
                hi_gen += 1
                Path(f"{lo_sync}_go{lo_gen}").touch()
                los2 = [e.result(window_deadline) for e in lo_engs]
                lo_gen += 1
                for e in [hi_eng] + lo_engs:  # re-arm for the next rep
                    e.expect(READY_MARKER, window_deadline)
            except _ProtocolTimeout as exc:
                # a window overran the whole budget: the engines are wedged
                # mid-pass (or dead) — record, tear down, return what we
                # have. NEVER propagate (BENCH_r04's failure mode).
                stop_evt.set()
                try:
                    pq_.get(timeout=10)
                except Exception:  # noqa: BLE001
                    pass
                probe.join(timeout=10)
                truncated = True
                protocol_error = f"window overran budget: {exc}"
                break
            stop_evt.set()
            probe_samples = pq_.get()
            probe.join()

            def _win_probes(t0: float, t1: float) -> tuple:
                return (
                    _probe_median(probe_samples, t0, t1),
                    _probe_median(probe_samples, t0, t1, idx=2),
                    _probe_median(probe_samples, t0, t1, idx=3),
                )

            def _span(los: list[dict]) -> tuple[float, float]:
                return (min(r["t0"] for r in los), max(r["t1"] for r in los))

            p1 = _win_probes(*_span(los1))
            p2 = _win_probes(*_span(los2))
            ph = _win_probes(r_hi["t0"], r_hi["t1"])

            # three-axis validity rule (as the kernel protocol): arithmetic
            # probe within 20%, page-fault probe within 2x, streaming
            # bandwidth within 1.5x — now required between the hi window
            # and EACH bracket. The fault and bandwidth probes matter MORE
            # here — a Spark stage (shuffle page churn, Arrow IPC, worker
            # forks, cache-missing kernel scans) rides the mm and DRAM
            # paths that arithmetic can't sense; a round-4 rep read
            # efficiency 0.421 with both original axes agreeing, which is
            # what motivated the bandwidth axis.
            def _pair_ok(a: tuple, b: tuple) -> bool:
                lims = (1.20, 2.0, 1.5)
                for va, vb, lim in zip(a, b, lims):
                    if va is None or vb is None:
                        return False
                    if max(va, vb) / max(min(va, vb), 1e-9) > lim:
                        return False
                return True

            probes_ok = _pair_ok(p1, ph) and _pair_ok(p2, ph)
            # aggregate capacity of the N-core engines vs the 4N-core engine,
            # under TWO definitions (both reported):
            #   eff_sum   — hi rate over the SUM of each engine's own-window
            #               rate. Overstates lo when engine walls spread: an
            #               engine finishing early frees its cores and the
            #               remaining engines' rates inflate (measured wall
            #               spread 19.9-30.3 s in one rep).
            #   eff_fleet — hi rate over (4 x n_scored / max lo wall): the
            #               strong-scaling fleet-completion definition (the 4
            #               concurrent jobs are done when the LAST finishes).
            #               Conservative on lo, immune to the straggler
            #               artifact.
            # Both normalize against the MEAN of the two brackets.
            def _agg(los: list[dict]) -> tuple[float, float]:
                s = sum(r["pairs_per_sec"] for r in los)
                fleet = len(los) * los[0]["n_pairs"] / max(
                    r["wall_sec"] for r in los
                )
                return s, fleet

            agg1, fleet1 = _agg(los1)
            agg2, fleet2 = _agg(los2)
            agg_lo = round((agg1 + agg2) / 2, 1)
            agg_lo_fleet = round((fleet1 + fleet2) / 2, 1)
            eff_fleet = r_hi["pairs_per_sec"] / agg_lo_fleet
            eff = r_hi["pairs_per_sec"] / agg_lo
            # bracket-agreement rule: the two fleet windows run IDENTICAL
            # work ~one hi-window apart; if their rates disagree by >25%,
            # the rep sat on a co-tenant wave edge and no normalization
            # is trustworthy — discard. This catches the exact failure the
            # pulse probes missed in the round-5 idle-box run.
            bracket_ratio = max(agg1, agg2) / max(min(agg1, agg2), 1e-9)
            brackets_ok = bracket_ratio <= 1.25
            # super-unity rule (round-3 VERDICT "What's wrong" #2): on equal
            # total cores, efficiency far above 1.0 means the lo window was
            # dilated by load the probes missed — contamination evidence, not
            # a bonus. Under the symmetric 4-job design the cap is 1.5 (was
            # 1.15 for the single-job-hi design): consolidation can now WIN
            # legitimately — 4 jobs' task waves pack into slots the
            # hard-partitioned fleet leaves idle at its per-engine barriers
            # (measured: 30% straggler loss at 32 tasks vs 8% at 8) — and
            # the three-axis probe rule is the primary dilation detector.
            super_unity_ok = eff <= 1.5
            valid = probes_ok and super_unity_ok and brackets_ok

            def _ms(v: float | None) -> float | None:
                return round(v * 1000, 3) if v else None

            def _mean_ms(a: float | None, b: float | None) -> float | None:
                vals = [v for v in (a, b) if v]
                return round(1000 * sum(vals) / len(vals), 3) if vals else None

            entry = {
                "rep": len(samples),
                "lo": {
                    "engines": los1 + los2,
                    "agg_pairs_per_sec": agg_lo,
                    "agg_pairs_per_sec_fleet": agg_lo_fleet,
                    "bracket1_pairs_per_sec": round(agg1, 1),
                    "bracket2_pairs_per_sec": round(agg2, 1),
                    "bracket_ratio": round(bracket_ratio, 3),
                    "t0": _span(los1)[0],
                    "t1": _span(los2)[1],
                },
                "hi": r_hi,
                "eff": round(eff, 3),
                "eff_fleet": round(eff_fleet, 3),
                "probe_ms_lo": _mean_ms(p1[0], p2[0]),
                "probe_ms_hi": _ms(ph[0]),
                "fault_probe_ms_lo": _mean_ms(p1[1], p2[1]),
                "fault_probe_ms_hi": _ms(ph[1]),
                "bw_probe_ms_lo": _mean_ms(p1[2], p2[2]),
                "bw_probe_ms_hi": _ms(ph[2]),
                "order": "sandwich(lo,hi,lo)",
                "launch_canary": canary,
                "quiet_gate_ok": gate_ok,
            }
            if not valid:
                if not brackets_ok:
                    entry["discard_reason"] = (
                        f"bracket disagreement {bracket_ratio:.3f} > 1.25 "
                        "(the two identical fleet windows disagree — "
                        "in-rep co-tenant wave)"
                    )
                elif not probes_ok:
                    entry["discard_reason"] = (
                        "probe windows disagree vs a bracket "
                        "(arith >20%, fault >2x, or bw >1.5x)"
                    )
                else:
                    entry["discard_reason"] = (
                        f"super-unity efficiency {eff:.3f} > 1.5 "
                        "(lo-window dilation that slipped past the probes)"
                    )
            (samples if valid else discarded).append(entry)
            last_rep_cost = time.time() - t_rep
        if len(samples) < repeats:
            truncated = True
    except _ProtocolTimeout as exc:
        # spin-up never became READY within the budget (loaded box, dead
        # child): truncate with whatever landed — never raise into bench
        truncated = True
        protocol_error = f"spin-up overran budget: {exc}"
    except Exception as exc:  # noqa: BLE001 — bench must ALWAYS get JSON
        truncated = True
        protocol_error = f"{type(exc).__name__}: {exc}"
    finally:
        if hi_eng is not None:
            hi_eng.shutdown()
        for e in lo_engs:
            e.shutdown()
    effs = [s["eff"] for s in samples]
    return {
        "budget_sec": budget_sec,
        "wall_sec": round(time.time() - t_protocol, 1),
        "truncated": truncated,
        "protocol_error": protocol_error,
        "attempts": attempts,
        "job": "score_pairs (join + repartition + Arrow-native kernel UDF)",
        "n_pairs": n_pairs,
        "scaling": "capacity-normalized strong scaling, SANDWICH reps: "
        f"{fanout} concurrent local[{lo}] engines (persistent, warmed once, "
        f"barrier-synced) bracket one local[{hi}] engine running "
        f"{fanout} concurrent jobs — lo,hi,lo per rep, hi normalized "
        "against the bracket MEAN (cancels linear drift); reps whose two "
        "identical brackets disagree >25% are discarded as in-rep waves; "
        f"same input, hard budget {budget_sec:.0f}s",
        "procs_lo": lo,
        "procs_hi": hi,
        "fanout": fanout,
        "repeats": repeats,
        "same_conditions": True,
        "samples": samples,
        "discarded_contaminated": discarded,
        "n_discarded": len(discarded),
        "efficiencies": effs,
        "efficiencies_fleet": [s["eff_fleet"] for s in samples],
        "efficiency_median": round(statistics.median(effs), 3) if effs else None,
        "efficiency_min": min(effs) if effs else None,
        "efficiency_fleet_median": round(
            statistics.median(s["eff_fleet"] for s in samples), 3
        )
        if samples
        else None,
        "efficiency_fleet_min": min(s["eff_fleet"] for s in samples)
        if samples
        else None,
        "pps_lo_median": round(
            statistics.median(s["lo"]["agg_pairs_per_sec"] for s in samples), 1
        )
        if samples
        else None,
        "pps_hi_median": round(
            statistics.median(s["hi"]["pairs_per_sec"] for s in samples), 1
        )
        if samples
        else None,
    }


def _md_table(out: dict) -> str:
    rows = "\n".join(
        f"| {s['rep']} | {s['lo']['agg_pairs_per_sec']} "
        f"({' + '.join(str(e['pairs_per_sec']) for e in s['lo']['engines'])}) | "
        f"{s['hi']['pairs_per_sec']} | {s['eff']:.3f} | "
        f"{s.get('eff_fleet', float('nan')):.3f} | "
        f"{s['probe_ms_lo']} / {s['probe_ms_hi']} | "
        f"{s['fault_probe_ms_lo']} / {s['fault_probe_ms_hi']} | "
        f"{s.get('bw_probe_ms_lo')} / {s.get('bw_probe_ms_hi')} | "
        f"{s.get('order', '?')}{'' if s.get('quiet_gate_ok', True) else ' (gate timeout)'} |"
        for s in out["samples"]
    )
    disc = ""
    if out.get("truncated"):
        disc += (
            f"\nTRUNCATED at the {out.get('budget_sec', '?')}s hard budget "
            f"after {out.get('wall_sec', '?')}s / {out.get('attempts', '?')} "
            f"attempt(s)"
            + (
                f" — {out['protocol_error']}"
                if out.get("protocol_error")
                else ""
            )
            + "; the reps below are the clean ones that landed in budget.\n"
        )
    if out["n_discarded"]:
        dl = ", ".join(
            f"eff={d['eff']:.3f} [{d.get('discard_reason', 'probe rule')}] "
            f"arith {d['probe_ms_lo']}/{d['probe_ms_hi']} ms "
            f"fault {d['fault_probe_ms_lo']}/{d['fault_probe_ms_hi']} ms "
            f"bw {d.get('bw_probe_ms_lo')}/{d.get('bw_probe_ms_hi')} ms"
            for d in out["discarded_contaminated"]
        )
        disc = (
            f"\nDiscarded {out['n_discarded']} contaminated rep(s) under the "
            f"stated rules (bracket agreement <= 1.25 + three-axis probe "
            f"agreement + efficiency <= 1.5): "
            f"{dl}\n"
        )
    if not out["samples"]:
        # every rep was discarded — render the discard evidence instead of
        # crashing on None medians (ADVICE r03)
        return (
            f"\n**Spark-level, capacity-normalized** — NO VALID REPS: all "
            f"{out['n_discarded']} attempt(s) were discarded under the "
            f"contamination rules; no efficiency claim is made from this "
            f"run. Re-run on a quieter box.\n" + disc
        )
    return (
        f"\n**Spark-level, capacity-normalized** — `score_pairs` "
        f"(join + repartition + Arrow-native kernel UDF) on the "
        f"same {out['n_pairs']}-pair parquet input, fresh JVM per engine, "
        f"measured window = the scoring action only (startup + warmup pass "
        f"excluded). {out['fanout']} CONCURRENT local[{out['procs_lo']}] "
        f"engines (barrier-synced measured passes, one job each) vs one "
        f"local[{out['procs_hi']}] engine running the SAME "
        f"{out['fanout']} independent jobs concurrently (driver threads) "
        f"— both windows fully occupied, all-Spark, identical total "
        f"workload; efficiency reported under BOTH aggregation "
        f"definitions — sum-of-rates (hi pairs/s over the SUM of each "
        f"engine's own-window rate) and fleet-completion (hi pairs/s over "
        f"{out['fanout']}x n_pairs / max lo wall — conservative, immune to "
        f"straggler inflation). Three-axis probe validity rule "
        f"(arithmetic 20%, page-fault 2x, stream-bandwidth 1.5x); per-rep "
        f"quiet gate (solo canary within 1.25x of its running floor, "
        f"bounded wait) and lo/hi order alternation; children warm to "
        f"steady state (consecutive passes within 15%, cap 4) before the "
        f"barrier.\n\n"
        f"| rep | agg pairs/s {out['fanout']}x local[{out['procs_lo']}] | "
        f"pairs/s @local[{out['procs_hi']}] | eff (sum-of-rates) | "
        f"eff (fleet: 4n/max-wall) | arith probe ms "
        f"lo/hi | fault probe ms lo/hi | bw probe ms lo/hi | order |\n"
        f"|---|---|---|---|---|---|---|---|---|\n{rows}\n\n"
        f"Spark-level efficiency {out['procs_lo']} -> {out['procs_hi']}: "
        f"**median {out['efficiency_median']:.3f}, "
        f"min {out['efficiency_min']:.3f}** (sum-of-rates); "
        f"**median {out.get('efficiency_fleet_median', float('nan')):.3f}, "
        f"min {out.get('efficiency_fleet_min', float('nan')):.3f}** "
        f"(fleet-completion) — target >= 0.8\n" + disc
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_pairs", type=int, nargs="?", default=49152)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cores", type=int)
    ap.add_argument("--input")
    ap.add_argument("--sync", default=None, help="barrier file (child mode)")
    ap.add_argument(
        "--jobs",
        type=int,
        default=1,
        help="concurrent scoring jobs in the measured window (child mode)",
    )
    ap.add_argument(
        "--persist",
        action="store_true",
        help="child mode: stay alive and serve a measured pass per go file",
    )
    ap.add_argument(
        "--budget",
        type=float,
        default=None,
        help="hard wall-clock budget (sec) for the whole protocol",
    )
    ap.add_argument("--no-md", action="store_true", help="skip BASELINE.md append")
    args = ap.parse_args()
    if args.child:
        child_main(
            args.cores, args.input, args.sync, jobs=args.jobs,
            persist=args.persist,
        )
        return
    out = run_protocol(
        args.n_pairs, args.repeats, args.lo, args.hi, budget_sec=args.budget
    )
    print(json.dumps(out))
    if not args.no_md:
        with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
            f.write(
                f"\n## Spark-level scaling protocol run "
                f"{time.strftime('%Y-%m-%d %H:%M:%S')}\n"
            )
            f.write(_md_table(out))


if __name__ == "__main__":
    main()
