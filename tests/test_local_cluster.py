"""REAL multi-executor evidence for the north rule's deployment path.

`local[N]` is one JVM — executor and driver share a process, so
broadcast, shuffle and --py-files code shipping are never truly
exercised across process boundaries. Spark's `local-cluster[N,cores,mem]`
master launches N SEPARATE executor JVMs (own block managers; real
serialization for every broadcast/shuffle byte; Python workers that can
import the package ONLY through the --py-files zip).

This test runs the documented spark-submit job (`scripts/
submit_build.py`, same flags as `make submit-demo`) on BOTH masters over
the same deterministic synthetic input, then asserts the persisted
merged state is BYTE-IDENTICAL for every order-insensitive sketch
(Bloom bit-OR, HLL register-max, CMS counter-add) and
quantile-consistent for the compactor sketches — i.e. the
partition-agnostic merge design holds across genuine executor process
boundaries, not just threads.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "bloomfilter_multithread_spark.zip")


def _submit(master: str, state: str, tmp_path, extra_conf=()) -> None:
    cmd = [
        "spark-submit", "--master", master,
        "--conf", "spark.sql.shuffle.partitions=8",
        *[c for pair in (("--conf", e) for e in extra_conf) for c in pair],
        "--py-files", ZIP,
        os.path.join(REPO, "scripts", "submit_build.py"),
        "--input", "synth:8000",
        "--bloom-key", "text", "--capacity", "100000", "--blocked", "--route",
        "--state", state,
    ]
    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_DIRS", str(tmp_path / "spark-local"))
    out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert os.path.exists(os.path.join(state, "_SUCCESS"))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None or shutil.which("make") is None,
    reason="spark-submit/make not on PATH",
)
def test_local_cluster_state_matches_single_jvm(spark, tmp_path):
    from bloomfilter_multithread_spark.operators.build import load_sketches

    out = subprocess.run(["make", "dist"], cwd=REPO, capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-1000:]

    st_local = str(tmp_path / "state_local")
    st_cluster = str(tmp_path / "state_cluster")
    _submit("local[8]", st_local, tmp_path)
    _submit("local-cluster[2,2,2048]", st_cluster, tmp_path,
            extra_conf=("spark.executor.memory=1g",))

    names = ["bloom_key", "hll_conv", "cms_tool", "kll_len", "td_len"]
    a = load_sketches(spark, st_local, names)
    b = load_sketches(spark, st_cluster, names)
    # order-insensitive merges: byte-identical across REAL executor JVMs
    for n in ("bloom_key", "hll_conv", "cms_tool"):
        assert a[n].to_bytes() == b[n].to_bytes(), n
    # compactor sketches are merge-order-sensitive by design; their
    # estimates must still agree within the rank bound on this data
    for n in ("kll_len", "td_len"):
        for q in (0.1, 0.5, 0.9):
            qa, qb = a[n].quantile(q), b[n].quantile(q)
            assert abs(qa - qb) <= 0.05 * max(abs(qa), 1.0), (n, q, qa, qb)
