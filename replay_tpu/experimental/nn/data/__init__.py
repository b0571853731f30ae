from replay_tpu.experimental.nn.data.schema_builder import TensorSchemaBuilder

__all__ = ["TensorSchemaBuilder"]
