from . import rhf, scf, properties, mp2  # noqa: F401
