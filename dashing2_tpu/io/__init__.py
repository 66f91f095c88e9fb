"""Host IO: sequence readers and the reference's on-disk binary formats."""
