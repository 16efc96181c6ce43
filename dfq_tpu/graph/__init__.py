from dfq_tpu.graph.ir import Graph, GraphBuilder, Node, quant_sites  # noqa: F401
from dfq_tpu.graph.executor import execute  # noqa: F401
