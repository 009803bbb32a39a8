"""Flow-matching samplers (functional: host-side coefficient tables +
pure-jax step updates)."""

from sparse_videogen_tpu.schedulers.euler import FlowMatchEuler  # noqa: F401
from sparse_videogen_tpu.schedulers.unipc import FlowUniPC  # noqa: F401
from sparse_videogen_tpu.schedulers.edm_euler import EDMEuler  # noqa: F401
from sparse_videogen_tpu.schedulers.fm_dpm import FlowDPM  # noqa: F401
from sparse_videogen_tpu.schedulers.ddim_cog import CogDDIM  # noqa: F401
