"""Scratch-dir stability: the same (kind, key) must resolve to the SAME
path in different driver processes (hash(str) randomization was the
round-2 bug: it defeated every cross-run reuse)."""

import os
import subprocess
import sys


def test_scratch_dir_stable_across_processes():
    code = (
        "from batch3dfier_spark.scratch import scratch_dir;"
        "print(scratch_dir('evdup', '/some/key/path'))"
    )
    outs = set()
    for seed in ("1", "2", "random"):
        env = dict(os.environ, PYTHONHASHSEED=seed,
                   PYTHONPATH="/root/repo")
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        outs.add(r.stdout.strip())
    assert len(outs) == 1
    assert next(iter(outs)).startswith("/tmp/batch3dfier_scratch/evdup_")


def test_fresh_scratch_dirs_are_unique_and_cleanable():
    from batch3dfier_spark.scratch import SCRATCH_ROOT, fresh_scratch_dir

    a = fresh_scratch_dir("ckpt")
    b = fresh_scratch_dir("ckpt")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)
    assert a.startswith(SCRATCH_ROOT) and b.startswith(SCRATCH_ROOT)
    import shutil

    shutil.rmtree(a), shutil.rmtree(b)
