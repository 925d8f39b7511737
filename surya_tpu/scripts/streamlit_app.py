"""Interactive GUI wiring all five predictors (reference:
surya/scripts/streamlit_app.py:24-131). Run with:

    surya_gui        # wraps `streamlit run` on this file

Requires streamlit (not installed in every environment; the CLI surfaces a
clear error if missing).
"""

from __future__ import annotations

import io


def run():
    import streamlit as st
    from PIL import Image

    from surya_tpu.debug.draw import draw_polys_on_image, draw_text_on_image
    from surya_tpu.models_registry import load_predictors
    from surya_tpu.recognition.tokenizer import TaskNames

    st.set_page_config(layout="wide")
    st.markdown("# Surya-TPU OCR Demo")

    @st.cache_resource()
    def predictors():
        return load_predictors()

    preds = predictors()

    uploaded = st.sidebar.file_uploader("PDF or image:", type=["png", "jpg", "jpeg", "webp"])
    if uploaded is None:
        st.stop()

    image = Image.open(io.BytesIO(uploaded.getvalue())).convert("RGB")
    col1, col2 = st.columns([0.5, 0.5])
    with col2:
        st.image(image, caption="Uploaded image", use_container_width=True)

    text_det = st.sidebar.button("Run Text Detection")
    layout_det = st.sidebar.button("Run Layout Analysis")
    ocr = st.sidebar.button("Run OCR")
    table_rec = st.sidebar.button("Run Table Recognition")
    use_math = st.sidebar.checkbox("Recognize math", value=True)

    with col1:
        if text_det:
            det = preds["detection"]([image])[0]
            polys = [b.polygon for b in det.bboxes]
            st.image(draw_polys_on_image(polys, image.copy()), caption="Detected lines")
            st.json(det.model_dump(exclude=["heatmap", "affinity_map"]), expanded=False)
        if layout_det:
            layout = preds["layout"]([image])[0]
            polys = [b.polygon for b in layout.bboxes]
            labels = [f"{b.label}-{b.position}" for b in layout.bboxes]
            st.image(draw_polys_on_image(polys, image.copy(), labels=labels), caption="Layout")
            st.json(layout.model_dump(), expanded=False)
        if ocr:
            result = preds["recognition"](
                [image],
                task_names=[TaskNames.ocr_with_boxes],
                det_predictor=preds["detection"],
                math_mode=use_math,
            )[0]
            bboxes = [line.bbox for line in result.text_lines]
            texts = [line.text for line in result.text_lines]
            st.image(draw_text_on_image(bboxes, texts, image.size), caption="OCR")
            st.json(result.model_dump(), expanded=False)
        if table_rec:
            table = preds["table_rec"]([image])[0]
            polys = [c.polygon for c in table.cells]
            st.image(draw_polys_on_image(polys, image.copy()), caption="Table cells")
            st.json(table.model_dump(), expanded=False)


if __name__ == "__main__":
    run()
