"""CLI tools (installed as the ``sipmask_tools`` package; see
pyproject.toml [project.scripts] for the console entry points)."""
