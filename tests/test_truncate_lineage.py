"""index.truncate_lineage: localCheckpoint in local mode, RELIABLE
checkpoint() when the context has a checkpoint dir — the cluster
durability contract from the r6 advice. The reliable branch runs in a
subprocess: setCheckpointDir is sticky on the shared SparkContext and
would silently flip every later test's checkpoint behavior."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_mode_uses_localcheckpoint(spark):
    from multi_attribute_join_search_with_mapreduce_spark.index import truncate_lineage

    df = truncate_lineage(spark.range(10))
    # lineage truncated: the plan is a scan of materialized partitions
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan, plan
    assert df.count() == 10


def test_checkpoint_dir_upgrades_to_reliable():
    script = r"""
import sys, tempfile, os
sys.path.insert(0, %(repo)r)
from multi_attribute_join_search_with_mapreduce_spark.session import get_spark
from multi_attribute_join_search_with_mapreduce_spark.index import truncate_lineage
spark = get_spark("truncate-lineage-probe")
d = tempfile.mkdtemp(prefix="majs_ckpt_")
spark.sparkContext.setCheckpointDir(d)
df = truncate_lineage(spark.range(10))
assert df.count() == 10
# a reliable checkpoint writes RDD block files under the checkpoint dir
files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
assert files, "no reliable-checkpoint files written under " + d
print("RELIABLE_OK", len(files))
"""
    out = subprocess.run(
        [sys.executable, "-c", script % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RELIABLE_OK" in out.stdout
