"""Config-driven orchestration: pipeline, cross-validation, event tooling."""
