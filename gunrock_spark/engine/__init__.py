from gunrock_spark.engine.iterate import iterate, IterationResult
from gunrock_spark.engine.checkpoint import CheckpointManager

__all__ = ["iterate", "IterationResult", "CheckpointManager"]
