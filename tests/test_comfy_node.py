"""ComfyUI node schema smoke test (node.py + comfyui_init.py).

The node must be importable and registrable without a ComfyUI install:
INPUT_TYPES parses, required Comfy class attributes exist, and the package
init exports the registration mappings the registry workflow publishes
(.github/workflows/publish.yml)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_node_schema_parses():
    node = _load("node", os.path.join(REPO, "node.py"))
    cls = node.Eden_LoRa_trainer
    schema = cls.INPUT_TYPES()
    assert "required" in schema
    req = schema["required"]
    for field in ("name", "training_images_folder", "mode", "sd_model_version",
                  "max_train_steps", "lora_rank", "seed"):
        assert field in req, field
    # widget specs are (type,) or (type, opts) tuples; enum widgets list choices
    for field, widget in req.items():
        assert isinstance(widget, tuple) and len(widget) in (1, 2), field
    assert set(req["mode"][0]) == {"style", "face", "object"}
    assert set(req["sd_model_version"][0]) == {"sdxl", "sd15"}
    assert len(cls.RETURN_TYPES) == len(cls.RETURN_NAMES) == 4
    assert callable(getattr(cls, cls.FUNCTION))
    assert isinstance(cls.CATEGORY, str)


def test_registration_mappings_exported():
    mappings = _load("node", os.path.join(REPO, "node.py")).NODE_CLASS_MAPPINGS
    assert "Eden_LoRa_trainer" in mappings
    # comfyui_init re-exports both mapping dicts for the registry package
    src = open(os.path.join(REPO, "comfyui_init.py")).read()
    assert "NODE_CLASS_MAPPINGS" in src and "NODE_DISPLAY_NAME_MAPPINGS" in src


def test_publish_workflow_exists():
    wf = os.path.join(REPO, ".github", "workflows", "publish.yml")
    assert os.path.exists(wf)
    text = open(wf).read()
    assert "publish-node-action" in text and "pyproject.toml" in text
    # registry metadata the action reads
    pyproject = open(os.path.join(REPO, "pyproject.toml")).read()
    assert "[tool.comfy]" in pyproject and "PublisherId" in pyproject
