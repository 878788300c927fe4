from . import rhf, scf, properties  # noqa: F401
