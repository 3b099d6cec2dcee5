from grtpu.blocks import analog, convert, fftblk, filter, gengen, misc, oscope, pfb, stream
