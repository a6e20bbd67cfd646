"""Sources/sinks: the ``.npb`` interop codec and format helpers."""
