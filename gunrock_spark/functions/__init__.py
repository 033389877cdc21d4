from gunrock_spark.functions.hashing import h60, h60_py, tokens

__all__ = ["h60", "h60_py", "tokens"]
