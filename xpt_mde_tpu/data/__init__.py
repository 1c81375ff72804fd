from xpt_mde_tpu.data.synthetic import PlanarSceneDataset, SyntheticDataset


def example_batch(loader) -> dict:
    """First batch for shape/init purposes, via the loader's side-effect
    free path when it has one (DatasetLoader/PrefetchLoader expose
    ``example_batch()`` so this consumes no epoch and leaks no prefetch
    producer; plain iterables fall back to ``next(iter(...))``)."""
    if hasattr(loader, "example_batch"):
        return loader.example_batch()
    return next(iter(loader))
