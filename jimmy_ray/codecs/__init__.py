"""From-scratch media codecs (public specs only).

The container has no PIL/cv2/scipy; the reference outsources image
handling to pdf_oxide / pillow.  These modules implement the spec subsets
the pipelines need — currently baseline JPEG (ITU-T T.81) for PDF
DCTDecode image XObjects and the multimodal feature stage.
"""
