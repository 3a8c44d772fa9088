"""spark-submit --py-files packaging, end-to-end in a SEPARATE process:
the driver process gets ONLY the zip (repo dir absent from PYTHONPATH), so
any module the zip forgot, any relative-import breakage, or any file-path
dependency inside the package fails here and nowhere else."""

import os
import shutil
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_packaging(tmp_path):
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    subprocess.run([sys.executable, os.path.join(REPO, "tools", "package.py")],
                   check=True, cwd=REPO, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "pdf_parser_benchmark_spark.zip")
    assert os.path.exists(zip_path)

    launcher = tmp_path / "launch.py"
    launcher.write_text(
        "from pdf_parser_benchmark_spark.plans.job import main\nmain()\n"
    )
    out, mani = str(tmp_path / "out"), str(tmp_path / "mani")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            str(launcher),
            "--synthetic-rows", "40",
            "--output", out,
            "--manifest", mani,
            "--n-splits", "8",
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/**/*.parquet')").fetchone()[0]
    assert n == 40
    errs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/**/*.parquet') WHERE error IS NOT NULL"
    ).fetchone()[0]
    assert errs == 0
