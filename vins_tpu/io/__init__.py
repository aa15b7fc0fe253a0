# dataset loaders + trajectory I/O
