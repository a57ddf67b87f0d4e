"""Kill+resume drill at the 1M-tile scaling world: run the 24-batch stream,
SIGKILL the process mid-stream, re-run to completion, and compare every output
artifact byte-for-byte against an uninterrupted reference run."""
import hashlib, json, os, shutil, signal, subprocess, sys, time
sys.path.insert(0, "/root/repo")

WORLD = "/tmp/augdiff_scaling_world_n1048576_g192_c96000_b24"
REF_BOOT = "/tmp/augdiff_scaling_boot"  # has a completed bootstrap to copy

def run_child(out, kill_after=None):
    code = f"""
import sys, logging; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("RAY_kill_idle_workers_interval_ms", "0")
import ray, ray.data as rd
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
rd.DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
from augdiff_pipeline_ray.pipelines import adiff as AD
job = AD.AdiffJob({WORLD!r}, {out!r})
job.bootstrap(); job.warm()
stats = job.run_stream()
job.close()
print("DONE", len(stats["batches"]), "skipped", len(stats["skipped"]))
ray.shutdown()
"""
    p = subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, text=True, cwd="/root/repo")
    if kill_after is None:
        out_s, _ = p.communicate()
        return out_s.strip().splitlines()[-1]
    time.sleep(kill_after)
    p.send_signal(signal.SIGKILL)
    p.wait()
    return "KILLED"

def tree_hash(out):
    h = hashlib.sha256()
    base = out
    files = []
    for root, _, fns in os.walk(base):
        for fn in fns:
            rel = os.path.relpath(os.path.join(root, fn), base)
            if rel.startswith(("adiff/", "assignments/", "knn/", "overlay/")):
                files.append(rel)
    for rel in sorted(files):
        h.update(rel.encode())
        h.update(open(os.path.join(base, rel), "rb").read())
    return h.hexdigest(), len(files)

def seed(out):
    shutil.rmtree(out, ignore_errors=True)
    shutil.copytree(REF_BOOT, out)
    # drop all stream state, keep only the bootstrap (lineage batch 0)
    for sub in ("adiff", "assignments", "knn", "overlay", "memory"):
        shutil.rmtree(os.path.join(out, sub), ignore_errors=True)
    lin = os.path.join(out, "lineage")
    for f in os.listdir(lin):
        if f != "batch-000000000.parquet":
            os.unlink(os.path.join(lin, f))
    # live index must reset to the base too: remove incremental segments
    idx = os.path.join(out, "index")
    for root, _, fns in os.walk(idx):
        for fn in fns:
            if "delta" in fn or "live" in fn:
                os.unlink(os.path.join(root, fn))

ref_out = "/tmp/drill_ref"
kil_out = "/tmp/drill_kill"
seed(ref_out); seed(kil_out)
print("reference run:", run_child(ref_out), flush=True)
rh, rn = tree_hash(ref_out)
print("killing mid-stream...", flush=True)
print(run_child(kil_out, kill_after=30.0), flush=True)
# count committed batches at the kill point
import glob
done = len(glob.glob(os.path.join(kil_out, "lineage", "batch-*.parquet"))) - 1
print("committed at kill:", done, flush=True)
r = run_child(kil_out); print("resume run:", r, flush=True)
kh, kn = tree_hash(kil_out)
print(json.dumps({"ref_hash": rh, "resumed_hash": kh, "files": [rn, kn],
                  "identical": rh == kh, "committed_at_kill": done}))
