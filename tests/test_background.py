"""Background generator: schema, privacy gating, rendering."""

import json

import numpy as np
import pytest

from video_stream_segmenetation_tpu import background as bg


@pytest.fixture
def data():
    return bg.sample_app_data()


def test_schema_roundtrip(data):
    assert "badge_left" in data.templates
    assert "demo" in data.employees
    t = data.templates["badge_left"]
    kinds = {l.type for l in t.layers}
    assert kinds == {"text", "image", "roundedRect"}


def test_from_json_accepts_reference_field_spelling():
    raw = {
        "background_options": ["a.png"],
        "templates": {
            "t": {
                "name": "t",
                "layers": [
                    {
                        "type": "text",
                        "privacy": "high",
                        "content": "email",
                        "x": 1,
                        "y": 2,
                        "lineHeight": 55,
                        "shadow": {"color": "#111", "blur": 3, "offsetX": 1, "offsetY": -1},
                    }
                ],
            }
        },
        "employees": {},
    }
    d = bg.AppData.from_json(json.dumps(raw))
    layer = d.templates["t"].layers[0]
    assert layer.line_height == 55
    assert layer.shadow.offset_y == -1


def test_text_for_layer_special_case(data):
    emp = data.employees["demo"]
    layer = [
        l for l in data.templates["badge_left"].layers
        if l.content == "department_and_company"
    ][0]
    assert bg.text_for_layer(layer, emp) == "Video Platform\nExample Corp"


def test_render_black_fill_and_layers(data):
    r = bg.BackgroundRenderer(
        data.templates["badge_left"], data.employees["demo"], canvas_hw=(270, 480)
    )
    img = r.render()
    assert img.shape == (270, 480, 3) and img.dtype == np.uint8
    # black background with light text/panel -> nonzero pixels exist
    assert img.max() > 0
    # corner far from all layers stays black
    assert img[0, 240:360].max() == 0


def test_privacy_gating_renders_fewer_pixels(data):
    def painted(privacy):
        r = bg.BackgroundRenderer(
            data.templates["badge_left"], data.employees["demo"],
            privacy=privacy, canvas_hw=(270, 480),
        )
        return (r.render().sum(-1) > 0).sum()

    low, med, high = painted("low"), painted("medium"), painted("high")
    assert low < med <= high  # more layers render at higher clearance


def test_render_cache_invalidation(data):
    r = bg.BackgroundRenderer(
        data.templates["minimal_center"], data.employees["demo"], canvas_hw=(135, 240)
    )
    a = r.render()
    assert r.render() is a  # cached
    r.set_employee_field("full_name", "Different Name")
    b = r.render()
    assert b is not a
    assert not np.array_equal(a, b)


def test_set_privacy_validates(data):
    r = bg.BackgroundRenderer(
        data.templates["minimal_center"], data.employees["demo"]
    )
    with pytest.raises(ValueError):
        r.set_privacy("top-secret")


def test_background_image_and_uploads(data):
    r = bg.BackgroundRenderer(
        data.templates["badge_left"], data.employees["demo"], canvas_hw=(135, 240)
    )
    # upload a background + a qr code (customization.ts:133-138 analog)
    grad = (np.mgrid[0:64, 0:64][0] * 4).astype(np.uint8)
    r.set_image("background", np.stack([grad, grad // 2, grad // 3], axis=-1))
    qr = np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    r.set_image("qr_code", qr)
    img = r.render()
    assert img.shape == (135, 240, 3)
    # background no longer black at the top rows
    assert img[40:60, 150:200].mean() > 5
