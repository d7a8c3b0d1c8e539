"""Schemas bundled INSIDE the installable artifact.

The deploy-time analogue of the reference's classpath schema loading
(``schema/SchemaRegistry.scala:58-69``): a containerized job can resolve
schemas with ``SchemaRegistry(package="lakehouse_ingestion_spark.schemas")``
without mounting the repo's ``schemas_registry/`` directory.

``schemas_registry/`` at the repo root stays the CANONICAL copy (edited
by humans, read by filesystem-path tests); this package mirrors it and
``tests/test_wheel_roundtrip.py`` asserts the two stay in sync.
"""
