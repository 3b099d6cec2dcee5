from grtpu.grc.flowgraph import main

main()
