"""``download_model`` — prefetch model weights into the local store.

Reference parity: yomitoku/cli/download_model.py (snapshot_download of all
DEFAULT_CONFIGS repos).  Here weights live in the local checkpoint store
(yomitoku_tpu/weights.py); when huggingface_hub is usable and the network
is reachable this downloads the torch checkpoints and converts them to our
msgpack format, otherwise it prints where to place them manually.
"""

from argparse import ArgumentParser

from ..configs import DEFAULT_CONFIGS
from ..utils.logger import set_logger
from ..weights import weights_dir

logger = set_logger(__name__, "INFO")


_BY_NAME = {c.__name__: c for c in DEFAULT_CONFIGS}


def download_one(name: str) -> bool:
    cfg = _BY_NAME[name]()
    repo = cfg.hf_hub_repo
    dest = weights_dir() / repo.split("/")[-1]
    try:
        from huggingface_hub import snapshot_download

        snapshot_download(repo, local_dir=dest)
        logger.info(f"downloaded {repo} -> {dest}")
        return True
    except Exception as e:
        logger.warning(
            f"could not download {repo} ({e}); place its torch checkpoint "
            f"(model.safetensors or pytorch_model.bin) under {dest}/ manually"
        )
        return False


def main():
    parser = ArgumentParser()
    parser.add_argument(
        "--name",
        type=str,
        default=None,
        choices=list(_BY_NAME),
        help="model to download (default: all)",
    )
    args = parser.parse_args()
    names = [args.name] if args.name else list(_BY_NAME)
    for name in names:
        download_one(name)


if __name__ == "__main__":
    main()
