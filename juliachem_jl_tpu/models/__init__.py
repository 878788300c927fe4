from . import rhf, scf, properties, mp2, gradient  # noqa: F401
