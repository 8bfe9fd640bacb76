"""Extension packages (SURVEY §3 E3): modules exposing ``register(engine)``.

The INSTALL/LOAD worked example the reference traces end-to-end
(/root/reference/duckdb:23-55) maps here: ``engine.install(module)`` checks
importability (InstallExtension records the artifact), ``engine.load``
imports and calls ``register(engine)`` (entry symbol + FinishLoad).
"""
