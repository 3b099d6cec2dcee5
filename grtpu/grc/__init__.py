from grtpu.grc.flowgraph import FlowgraphSpec, generate_script, load_flowgraph
from grtpu.grc.registry import BLOCK_REGISTRY, register_block
