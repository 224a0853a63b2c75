"""Capture .explain('formatted') for round-7 target queries (before/after)."""
import os, sys, io, contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E
from table_recognition_spark.session import get_spark

def main(suffix: str, names: list[str]) -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans_r07", parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = E.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        buf = io.StringIO()
        try:
            df = qs[name](spark, sf)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        except Exception as e:  # plan-only capture must not die mid-list
            buf.write(f"ERROR capturing {name}: {e}\n")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("captured", name, suffix)
    spark.stop()

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2].split(","))
