from cubert_spark.script.plan import run_plan, run_plan_file

__all__ = ["run_plan", "run_plan_file"]
