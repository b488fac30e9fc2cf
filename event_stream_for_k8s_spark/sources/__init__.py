"""Sources & sinks: format roundtrips, streaming file source, k8s schema."""
