"""Packaging / export layer (reference: packaging/*).

Bidirectional HF ``ASTForAudioClassification`` conversion, safetensors I/O,
and TF SavedModel export of the jitted inference program.
"""

from .hf_ast import (  # noqa: F401
    ast_config_dict,
    from_hf_ast_state,
    jax_to_torch_state,
    save_pretrained,
    save_torch_checkpoint,
    to_hf_ast_state,
)
from .export import export_tf_saved_model  # noqa: F401
