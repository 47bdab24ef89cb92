"""Release-ingestion drill: the day the released artifacts are reachable,
`download -> md5 -> untar -> tf-bundle read -> convert ->
examples/evaluation.py` must work first try. This drill executes that
exact chain end-to-end against locally fabricated artifacts in the real
formats (tools/fabricate_release.py): a TF bundle checkpoint tarball with
the reference's variable manifest and md5-pinned test-set tarballs in the
real multiviH5 schema. The production scripts run UNEDITED as real
subprocesses (with their file://-override flags).

Reference chain: weights/download_weights.sh:1-3,
datasets/download_testdata.sh:57, examples/evaluation.py:263-321.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script_cpu(script, *argv, timeout=1200):
    """Run a repo script (path) or package module (dotted name) as a
    subprocess pinned to the CPU platform (the ambient axon/TPU platform
    must stay free for concurrent training)."""
    if script.endswith(".py"):
        script = os.path.join(REPO, script)
        runner = f"runpy.run_path({script!r}, run_name='__main__')"
    else:
        runner = f"runpy.run_module({script!r}, run_name='__main__')"
    code = (
        "import jax, runpy, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.argv = {[script] + list(argv)!r}\n"
        f"{runner}\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout, env=env, cwd=REPO)
    if r.returncode != 0:
        raise AssertionError(
            f"{os.path.basename(script)} {argv} exited {r.returncode}:\n"
            f"--- stdout ---\n{r.stdout[-3000:]}\n"
            f"--- stderr ---\n{r.stderr[-3000:]}")
    return r.stdout


@pytest.fixture(scope="module")
def release_dir(tmp_path_factory):
    """Fabricated release artifacts: weights tgz + two test-set tgzs +
    md5 manifest (tools/fabricate_release) — two datasets so the drill
    exercises the multi-dataset loop of the download/eval scripts."""
    out = str(tmp_path_factory.mktemp("release"))
    run_script_cpu("demon_tpu.tools.fabricate_release",
                   "--out-dir", out, "--datasets", "sun3d", "rgbd",
                   "--scenes", "2")
    assert os.path.isfile(os.path.join(out, "demon_original_weights.tgz"))
    assert os.path.isfile(os.path.join(out, "sun3d_test.tgz"))
    assert os.path.isfile(os.path.join(out, "rgbd_test.tgz"))
    assert os.path.isfile(os.path.join(out, "manifest.json"))
    return out


def test_release_ingestion_drill(release_dir, tmp_path):
    """The one-command egress-day path: `make egress-day` runs
    download -> md5 -> untar -> convert -> evaluation with the
    production scripts unedited; the drill executes the exact make
    target with its file:// overrides (VERDICT round-3 directive 7)."""
    data_dir = str(tmp_path / "data")
    wdir = str(tmp_path / "weights")
    eval_dir = str(tmp_path / "eval")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        ["make", "egress-day",
         f"PY={sys.executable} tests/_cpu_runner.py",
         "DATASETS=sun3d rgbd",
         f"DATA_DIR={data_dir}",
         f"WEIGHTS_DIR={wdir}",
         f"EVAL_DIR={eval_dir}",
         "VARIANT=v1",
         f"TESTDATA_FLAGS=--base-url file://{release_dir} "
         f"--md5-manifest {os.path.join(release_dir, 'manifest.json')}",
         "WEIGHTS_FLAGS=--url "
         f"file://{os.path.join(release_dir, 'demon_original_weights.tgz')}",
         # exercise the W>1 deterministic test phase through the
         # production evaluation app (exact coverage + order preserved)
         "EVAL_FLAGS=--reader-workers 2",
         ],
        capture_output=True, text=True, timeout=2400, env=env, cwd=REPO)
    if r.returncode != 0:
        raise AssertionError(
            f"make egress-day exited {r.returncode}:\n"
            f"--- stdout ---\n{r.stdout[-4000:]}\n"
            f"--- stderr ---\n{r.stderr[-4000:]}")
    out = r.stdout

    # 1. test-set download + md5 verification + untar (both datasets)
    assert "sun3d_test.h5 ready" in out
    assert "rgbd_test.h5 ready" in out
    assert os.path.isfile(os.path.join(data_dir, "sun3d_test.h5"))
    assert os.path.isfile(os.path.join(data_dir, "rgbd_test.h5"))
    # 2. weights download + untar + bundle read + convert + verify
    assert "converted weights saved" in out
    assert os.path.isdir(os.path.join(wdir, "demon_tpu_v1"))
    # 3. the full reference-protocol evaluation app, untouched — the
    # W>1 mp-reader path runs per dataset (EVAL_FLAGS above)
    for ds in ("sun3d", "rgbd"):
        assert os.path.isfile(os.path.join(eval_dir, f"{ds}_eval.json"))
        assert os.path.isfile(
            os.path.join(eval_dir, f"{ds}_eval_crop_allpix.json"))
    # the paper metrics printed at the reference report points
    assert "depth depth_l1_inverse:" in out
    assert "motion rot_err:" in out
