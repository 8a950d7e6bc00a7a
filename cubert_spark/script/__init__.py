from cubert_spark.script.cmr import (
    compile_script,
    run_script,
    run_script_file,
)
from cubert_spark.script.plan import run_plan, run_plan_file

__all__ = [
    "compile_script",
    "run_plan",
    "run_plan_file",
    "run_script",
    "run_script_file",
]
