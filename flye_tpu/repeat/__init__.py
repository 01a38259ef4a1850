from flye_tpu.repeat.graph import RepeatGraph, GraphEdge, GraphNode, EdgeSequence
