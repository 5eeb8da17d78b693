#!/usr/bin/env python3
"""Isolated-steady bench archive (VERDICT r7 item 8 / r8 item 3).

Runs each selected query in its OWN fresh JVM (one graft.Bench invocation
per query), so a query's number carries none of the suite context —
previous queries' broadcast/shuffle/GC debt, codegen-cache pressure,
ContextCleaner backlog — that makes in-suite numbers move for code a
round never touched. Writes BENCH_ISOLATED_r{N}.json with per-query
steady (min), first, and the full repeats array, plus the in-suite
steady numbers current at run time for one-glance suite-vs-isolated
comparison.

Usage: tools/bench_isolated.py <round> [n_top] [extra-query-names...]
  round   stamp for the output file (e.g. 09)
  n_top   take the top-N queries by in-suite steady from BENCH_DETAIL.json
          (default 20); extra names are unioned in.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_BENCH_REPEAT (default 3).
"""
import json
import re, os, shutil, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")

ADD_OPENS = []
for p in ("java.lang java.lang.invoke java.lang.reflect java.io java.net "
          "java.nio java.util java.util.concurrent java.util.concurrent.atomic "
          "sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar").split():
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]


def run_one(name: str, env: dict) -> dict | None:
    detail = env.get("SPARK_GRAFT_DETAIL_PATH", DETAIL)
    cp = os.path.join(REPO, "target/scala-2.13/classes") + ":" + ":".join(
        sorted(os.path.join("/opt/spark/jars", f)
               for f in os.listdir("/opt/spark/jars") if f.endswith(".jar")))
    cmd = ["java", *ADD_OPENS, "-Xmx24g", "-Dspark.ui.enabled=false",
           "-Dspark.sql.session.timeZone=UTC", "-cp", cp, "graft.Bench", name]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(f"[isolated] {name} FAILED rc={r.returncode}\n")
        sys.stderr.write(r.stderr[-2000:] + "\n")
        return None
    with open(detail) as f:
        d = json.load(f)
    if name not in d["steady_sec"]:
        sys.stderr.write(f"[isolated] {name}: no detail entry (filter matched "
                         f"{list(d['steady_sec'])})\n")
        return None
    return {"steady": d["steady_sec"][name], "first": d["first_sec"][name],
            "repeats": d["repeats_sec"][name]}


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    rnd = sys.argv[1]
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    extra = sys.argv[3:]

    with open(DETAIL) as f:
        suite = json.load(f)
    # n_top == 0: run EXACTLY the extra names (parallel-worker partition
    # mode — each worker gets its own SPARK_GRAFT_DETAIL_PATH so the
    # per-query detail files never race)
    top = [] if n_top == 0 else [k for k, _ in sorted(
        suite["steady_sec"].items(), key=lambda kv: -kv[1])[:n_top]]
    names = top + [e for e in extra if e not in top]

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env.setdefault("SPARK_GRAFT_BENCH_REPEAT", "3")
    scoped = "SPARK_GRAFT_DETAIL_PATH" in env
    if scoped:
        # the worker's Bench writes its own detail file — the shared
        # BENCH_DETAIL.json is never touched, no backup dance needed
        # default the suffix from the worker's detail path when unset —
        # two scoped workers without explicit suffixes must not race on
        # the final archive (ADVICE r14)
        default_sfx = "_" + re.sub(
            r"\W+", "_", os.path.basename(env["SPARK_GRAFT_DETAIL_PATH"]))
        out_suffix = os.environ.get("SPARK_GRAFT_ISOLATED_SUFFIX", default_sfx)
    else:
        out_suffix = ""
        backup = DETAIL + ".bak_isolated"
        shutil.copy(DETAIL, backup)
    out = {"sf": env["SPARK_GRAFT_SF_DIR"],
           "repeat": int(env["SPARK_GRAFT_BENCH_REPEAT"]),
           "queries": {}, "suite_steady_sec": {}}
    try:
        for i, name in enumerate(names, 1):
            res = run_one(name, env)
            if res is None:
                continue
            out["queries"][name] = res
            out["suite_steady_sec"][name] = suite["steady_sec"].get(name)
            print(f"[{i}/{len(names)}] {name}: isolated steady "
                  f"{res['steady']:.2f}s (suite {suite['steady_sec'].get(name, -1):.2f}s) "
                  f"repeats {['%.2f' % t for t in res['repeats']]}", flush=True)
    finally:
        if not scoped:
            shutil.move(backup, DETAIL)

    path = os.path.join(REPO, f"BENCH_ISOLATED_r{rnd}{out_suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path} ({len(out['queries'])} queries)")


if __name__ == "__main__":
    main()
