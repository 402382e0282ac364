"""A/B: old (r7) vs new (r8) minhash_lsh_pairs kernel at sf16, interleaved, same session.

Evidence artifact for SCALE.md's r8 throttle-attribution note (results in
_scale/ab_d03_r8.txt). Regenerates the r7 kernel snapshot from git."""
import subprocess, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OLD_SRC = "/tmp/dedup_r7_snapshot.py"
with open(OLD_SRC, "w") as fh:
    fh.write(subprocess.run(
        ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "show", "d6eb2f0~1:dibimbing_case_study_etl_spark/operators/dedup.py"],
        check=True, capture_output=True, text=True).stdout)
import importlib.util, sys, time
from dibimbing_case_study_etl_spark.session import get_spark
from dibimbing_case_study_etl_spark.catalog import load_table

spec = importlib.util.spec_from_file_location("dedup_old_r7", OLD_SRC)
old = importlib.util.module_from_spec(spec)
sys.modules["dedup_old_r7"] = old
spec.loader.exec_module(old)
import dibimbing_case_study_etl_spark.operators.dedup as new

spark = get_spark(app_name="ab-d03", shuffle_partitions=128)
spark.sparkContext.setLogLevel("ERROR")
docs01 = load_table(spark, "/root/testdata/sf0.1", "documents")
docs16 = load_table(spark, "/root/repo/_scale/sf16", "documents")

def run(mod, docs, label):
    t0 = time.perf_counter()
    mod.minhash_lsh_pairs(docs, "doc_id", "text", k=3, threshold=0.8).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(label, round(dt, 1), "s", flush=True)
    spark.catalog.clearCache()
    import gc
    gc.collect(); spark.sparkContext._jvm.System.gc(); time.sleep(3)
    return dt

# warmup both paths at sf0.1
run(new, docs01, "warm new sf0.1"); run(old, docs01, "warm old sf0.1")
for i in range(2):
    run(new, docs16, f"NEW sf16 #{i}")
    run(old, docs16, f"OLD sf16 #{i}")
