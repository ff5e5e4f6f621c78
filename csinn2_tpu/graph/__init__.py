from csinn2_tpu.graph.ir import Graph, Node
