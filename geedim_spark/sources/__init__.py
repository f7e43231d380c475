"""Table IO: snapshot-manifest layer (Iceberg-style) + images table IO."""
