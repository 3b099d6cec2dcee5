from grtpu.blocks import convert, gengen, stream
