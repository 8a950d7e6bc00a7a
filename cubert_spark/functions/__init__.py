from cubert_spark.functions.registry import BUILTINS, call, cubert_expr

__all__ = ["BUILTINS", "call", "cubert_expr"]
