#!/usr/bin/env python3
"""Interleaved A/B bench of two git refs on one box.

Round-over-round bench drift has twice been explained by attestation
("the box was loaded") instead of an artifact. This harness makes the
question falsifiable: it checks out both refs as worktrees, injects an
identical minimal runner (BenchAB.scala — table warmup, one untimed
warm pass, N timed passes, per-query JSON), builds each once, then
runs them STRICTLY ALTERNATING (A B A B ...) so slow-box drift hits
both arms equally. Per query it takes the median over each arm's runs
and sign-tests the paired deltas across queries (exact two-sided
binomial on the direction counts) — a real code regression shows up as
a lopsided sign count with small p; environment noise shows up as
~50/50 signs. Also reports the A-arm's own run-to-run spread as the
noise floor.

Usage:
  python3 scripts/bench_ab.py <refA> <refB> [--pairs N] [--sf DIR]
                              [--cpus N] [--out BENCH_AB.json]

The runner is injected into each worktree (it only uses SparkEntry /
Tables / Memo, stable across the compared refs) and worktrees live
under /tmp/graft_ab — the repo itself is never touched.
"""
import argparse
import json
import math
import os
import shutil
import statistics
import subprocess
import sys

RUNNER = r"""
package graft
import org.apache.spark.sql.SparkSession
/** Injected by scripts/bench_ab.py — minimal, ref-agnostic bench pass. */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_AB_PASSES", "1").toInt
    val out = sys.env("SPARK_GRAFT_AB_OUT")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    def pass() = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    pass() // untimed warm pass: memo/checkpoint builds off the clock
    val timed = (1 to passes).map(_ => pass())
    val results = timed.head.keys.map { name =>
      name -> timed.map(_(name)).min
    }.toMap
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val body = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
"""


def sh(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, **kw)


def prepare(ref, root):
    wt = os.path.join(root, ref.replace("/", "_"))
    if os.path.exists(wt):
        sh(["git", "worktree", "remove", "--force", wt])
    sh(["git", "worktree", "add", "--detach", wt, ref])
    with open(os.path.join(wt, "src/main/scala/graft/BenchAB.scala"), "w") as f:
        f.write(RUNNER)
    sh(["sbt", "-batch", "compile"], cwd=wt,
       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return wt


def classpath(wt):
    return f"{wt}/target/scala-2.13/classes:/opt/spark/jars/*"


def run_once(wt, out, sf, cpus, passes):
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_AB_PASSES": str(passes),
        "SPARK_GRAFT_AB_OUT": out,
    })
    # the --add-opens set mirrors Spark's own launcher (JavaModuleOptions);
    # IgnoreUnrecognizedVMOptions keeps it portable across JDKs
    opens = [f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in (
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
        "sun.nio.cs", "sun.security.action", "sun.util.calendar")]
    # -Xmx24g matches build.sbt's forked-run default, so both arms run
    # in the same memory envelope the driver bench uses
    sh(["java", "-Xmx24g", "-XX:+IgnoreUnrecognizedVMOptions",
        "-Djdk.reflect.useDirectMethodHandle=false",
        "--enable-native-access=ALL-UNNAMED", *opens,
        "-cp", classpath(wt), "graft.BenchAB"],
       cwd=wt, env=env,
       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out) as f:
        return json.load(f)


def binom_two_sided(k, n):
    """Exact two-sided sign-test p-value, p0 = 0.5."""
    if n == 0:
        return 1.0
    lo = min(k, n - k)
    p = sum(math.comb(n, i) for i in range(0, lo + 1)) / 2.0 ** n
    return min(1.0, 2.0 * p)


def paired_permutation(diffs):
    """Exact paired permutation test on run-total differences: under
    H0 (no arm effect) each pair's sign is exchangeable, so enumerate
    all 2^n sign assignments and count |mean| >= |observed mean|.
    Unlike the per-query sign test, the n pairs here are genuinely
    independent units (whole interleaved runs), so this p-value does
    not overstate certainty through shared box state."""
    n = len(diffs)
    if n == 0:
        return 1.0
    obs = abs(sum(diffs))
    hits = 0
    for mask in range(2 ** n):
        s = sum(d if (mask >> i) & 1 else -d for i, d in enumerate(diffs))
        if abs(s) >= obs - 1e-12:
            hits += 1
    return hits / 2.0 ** n


def wilcoxon_signed_rank(diffs):
    """Exact Wilcoxon signed-rank on the run-total pairs (two-sided):
    rank |d|, W+ = sum of ranks with d > 0, exact null distribution by
    enumeration (n is small — the pair count)."""
    d = [x for x in diffs if x != 0.0]
    n = len(d)
    if n == 0:
        return 1.0
    ranked = sorted(range(n), key=lambda i: abs(d[i]))
    ranks = [0.0] * n
    i = 0
    while i < n:  # average ranks over |d| ties
        j = i
        while j + 1 < n and abs(d[ranked[j + 1]]) == abs(d[ranked[i]]):
            j += 1
        avg = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            ranks[ranked[k]] = avg
        i = j + 1
    w_pos = sum(r for r, x in zip(ranks, d) if x > 0)
    # exact null: all 2^n sign assignments of the same ranks
    ws = [0.0]
    for r in ranks:
        ws = [w for w in ws] + [w + r for w in ws]
    tot = len(ws)
    lo = sum(1 for w in ws if w <= w_pos + 1e-12) / tot
    hi = sum(1 for w in ws if w >= w_pos - 1e-12) / tot
    return min(1.0, 2.0 * min(lo, hi))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("refA")
    ap.add_argument("refB")
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--out", default="BENCH_AB.json")
    args = ap.parse_args()

    root = "/tmp/graft_ab"
    os.makedirs(root, exist_ok=True)
    wtA, wtB = prepare(args.refA, root), prepare(args.refB, root)

    runsA, runsB = [], []
    for i in range(args.pairs):
        for tag, wt, acc in (("A", wtA, runsA), ("B", wtB, runsB)):
            out = os.path.join(root, f"run_{tag}{i}.json")
            r = run_once(wt, out, args.sf, args.cpus, args.passes)
            acc.append(r)
            print(f"run {tag}{i}: total {sum(r.values()):.1f}s over "
                  f"{len(r)} queries", flush=True)
        # incremental report: a long run always leaves an artifact
        write_report(args, runsA, runsB)


def write_report(args, runsA, runsB):
    common = sorted(set.intersection(*[set(r) for r in runsA + runsB]))
    medA = {q: statistics.median(r[q] for r in runsA) for q in common}
    medB = {q: statistics.median(r[q] for r in runsB) for q in common}
    deltas = {q: medB[q] - medA[q] for q in common}
    pos = sum(1 for d in deltas.values() if d > 0)
    neg = sum(1 for d in deltas.values() if d < 0)
    p = binom_two_sided(pos, pos + neg)
    totA, totB = sum(medA.values()), sum(medB.values())
    # A-arm noise floor: split-half total spread across A runs
    a_totals = [sum(r[q] for q in common) for r in runsA]
    b_totals = [sum(r[q] for q in common) for r in runsB]
    top = sorted(common, key=lambda q: deltas[q], reverse=True)
    fmt = lambda q: {"query": q, "a_sec": round(medA[q], 3),
                     "b_sec": round(medB[q], 3),
                     "delta_sec": round(deltas[q], 3)}
    # run-level paired statistics: the honest headline p-values — each
    # interleaved (A, B) run pair is an independent unit, unlike the
    # per-query deltas which share within-run box state
    run_diffs = [b - a for a, b in zip(a_totals, b_totals)]
    report = {
        "schema": 2,
        "ref_a": args.refA, "ref_b": args.refB,
        "sf": args.sf, "cpus": args.cpus,
        "pairs_done": len(runsB), "pairs_planned": args.pairs,
        "timed_passes_per_run": args.passes,
        "n_common_queries": len(common),
        "total_a_sec": round(totA, 2), "total_b_sec": round(totB, 2),
        "total_ratio_b_over_a": round(totB / totA, 4),
        "per_run_totals_a": [round(t, 1) for t in a_totals],
        "per_run_totals_b": [round(t, 1) for t in b_totals],
        "run_level": {
            "paired_diffs_sec": [round(d, 1) for d in run_diffs],
            "p_permutation_two_sided": round(paired_permutation(run_diffs), 4),
            "p_wilcoxon_two_sided": round(wilcoxon_signed_rank(run_diffs), 4),
        },
        "sign_test": {"b_slower": pos, "b_faster": neg,
                      "p_two_sided": round(p, 6),
                      "caveat": "per-query deltas share within-run box "
                                "state and are not independent trials; "
                                "treat this p as optimistic and read "
                                "run_level for the honest headline"},
        "top_regressions_b_vs_a": [fmt(q) for q in top[:10]],
        "top_improvements_b_vs_a": [fmt(q) for q in reversed(top[-10:])],
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("total_a_sec", "total_b_sec", "total_ratio_b_over_a",
                       "sign_test")}, indent=1))


if __name__ == "__main__":
    main()
