from . import boys, class_tables, mcmurchie, oei, eri, schwarz  # noqa: F401
