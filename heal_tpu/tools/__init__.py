"""CLI tools: train, inference, checkpoint merge (HEAL stage 3), profiler.

Capability parity with reference ``opencood/tools``.
"""
