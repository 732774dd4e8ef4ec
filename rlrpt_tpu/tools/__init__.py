"""Analysis + CLI tooling (the Graphing/ equivalents and the runner)."""
