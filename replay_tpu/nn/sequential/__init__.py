from replay_tpu.nn.sequential.sasrec import SasRec, SasRecBody, SasRecTransformerLayer

__all__ = ["SasRec", "SasRecBody", "SasRecTransformerLayer"]
