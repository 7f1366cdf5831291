"""Host-side utilities: visualization, IO."""
