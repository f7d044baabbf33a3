from satae.nn import init, layers  # noqa: F401
