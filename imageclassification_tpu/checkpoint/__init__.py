from .io import (
    save_model,
    auto_load_model,
    derive_prune_masks,
    find_latest_checkpoint,
    load_checkpoint,
    load_params_with_pruning,
    wait_for_pending_saves,
)
