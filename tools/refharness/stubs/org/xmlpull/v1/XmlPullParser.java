package org.xmlpull.v1;

import java.io.Reader;

/**
 * Compile-only shim: the minimal subset of the public XmlPull v1 API
 * (xmlpull.org) referenced by the reference's AbstractXppParser. The
 * differential golden test never parses XML, so these methods are never
 * invoked — the stub exists only so javac can resolve the imports of
 * classes on the solver compile closure.
 */
public interface XmlPullParser {
    int START_DOCUMENT = 0;
    int END_DOCUMENT = 1;
    int START_TAG = 2;
    int END_TAG = 3;
    int TEXT = 4;

    void setInput(Reader in) throws XmlPullParserException;

    int getEventType() throws XmlPullParserException;

    int next() throws XmlPullParserException, java.io.IOException;

    String getName();

    String getText();

    String getAttributeValue(String namespace, String name);
}
