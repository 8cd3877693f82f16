"""North-rule launch-mode smoke: the pipeline must run via
``spark-submit --py-files <package.zip>`` with the package imported FROM
THE ZIP (the script is copied out of the repo so the repo dir cannot
satisfy the import), producing the per-stage summary JSON and resumable
checkpoints."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


def _zip_package(dest: str) -> str:
    pkg = os.path.join(REPO, "nlp_series_relation_extraction_spark")
    zpath = os.path.join(dest, "nre_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath

def test_run_head_lifecycle_cli(tmp_path):
    """The per-head train->checkpoint->predict->score CLI (the reference's
    run_X.py equivalent) runs end to end and reports a decreasing loss,
    a saved checkpoint, and reference-format predictions."""
    import sys

    wd = str(tmp_path / "head_run")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_head.py"),
         "--head", "mpn", "--synthetic", "80", "--epochs", "2",
         "--workdir", wd],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    summary = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    h = summary["loss_history"]
    assert len(h) == 2 and h[1] < h[0]
    assert os.path.exists(summary["weights"])
    pred_files = [
        f for f in os.listdir(summary["predictions"]) if f.startswith("part-")
    ]
    assert pred_files
    # Concatenate ALL part files: robust regardless of how many partitions
    # the sink wrote and of os.listdir ordering (empty parts are fine).
    lines = []
    for fn in sorted(pred_files):
        with open(os.path.join(summary["predictions"], fn),
                  encoding="utf-8") as f:
            lines.extend(l for l in f if l.strip())
    assert lines, "prediction sink wrote no records"
    first = json.loads(lines[0])
    assert set(first) == {"text", "spo_list"}
    assert summary["eval"]["tp"] + summary["eval"]["fp"] >= 0


def test_spark_submit_py_files_pipeline(tmp_path):
    zpath = _zip_package(str(tmp_path))
    # copy the entry script OUT of the repo: its sys.path bootstrap then
    # points at tmp_path's parent, so the package can only come from the zip
    script = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), script)
    wd = str(tmp_path / "kg")
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zpath,
        script,
        "--synthetic", "60",
        "--workdir", wd,
        "--head", "mpn",
        "--planted",
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing from the repo leaks into workers
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-4000:]
    summary = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["head"] == "mpn"
    for stage in ("triples", "mentions", "entities", "aliases",
                  "triples_canonical", "edges"):
        assert summary["rows"].get(stage, 0) > 0, (stage, summary)
    # checkpoints landed and are resumable artifacts (versioned-manifest
    # layout: <stage>/_CURRENT names a committed vNNNNNN directory)
    manifest_path = os.path.join(wd, "triples", "_CURRENT")
    assert os.path.exists(manifest_path)
    manifest = json.loads(open(manifest_path).read())
    assert os.path.exists(
        os.path.join(wd, "triples", manifest["version"], "_SUCCESS")
    )
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))
