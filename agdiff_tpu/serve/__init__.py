from agdiff_tpu.serve.server import GenerationService, probe_molecule, submit

__all__ = ["GenerationService", "probe_molecule", "submit"]
