"""Multi-blend batching and multi-chip sharding.

The reference has no distributed layer (SURVEY.md §5.8); blends are
mathematically independent, so the TPU scaling axes are (1) ``vmap`` over a
batch of blends within a chip and (2) ``pjit`` sharding of that batch across
the ICI mesh, with an optional band (channel) axis for model parallelism.
"""
from .batch import (  # noqa: F401
    BatchConfig,
    pack_batch,
    pack_blends,
    unpack_blends,
    replicate_blend,
    fit_batch,
    fit_batch_converged,
    fit_batch_device_converged,
    fit_batch_sharded,
    make_mesh,
    shard_batch,
)
from .pipeline import (  # noqa: F401
    BlendPipeline,
    deblend_stream,
    build_lite_blend,
)
from .stream import (  # noqa: F401
    stream_setup,
    stream_records,
    deblend_device_stream,
)
from .detection import (  # noqa: F401
    detect_peaks_device,
    label_components_device,
)
from .multires import (  # noqa: F401
    MultiResFitter,
    multires_init,
    multires_records,
    deblend_multires,
)
